"""WARC-ingest scaling probe: the crawl-shard read path at two
parallelism levels (same protocol as tools/bench_scaling.py — no real
cluster here, so N vs 4N executors is evidenced as local[N] vs
local[4N] in fresh JVMs on identical input, loadavg recorded).

Corpus: SCALING_WARC_DOCS response records (default 200k) across
SCALING_WARC_SHARDS per-member-gzipped shards with CDX sidecars,
generated ONCE (executor-parallel, one shard per task) and reused.
The measured job is the full read path — CDX split planning →
descriptor shuffle → ranged read → member inflate → WARC+HTTP parse →
text extraction — reduced to (count, sum(payload_len), sum of text
hashes), so every page is parsed and extracted but only aggregates
return. Throughput = records/sec.

Usage:
    python tools/bench_warc_scale.py              # both levels → BENCH/WARC_SCALE.md
    python tools/bench_warc_scale.py --cores 4    # one level (JSON to stdout)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("SCALING_WARC_DOCS", "200000"))
N_SHARDS = int(os.environ.get("SCALING_WARC_SHARDS", "16"))
# realistic page weight: the 40-byte fixture pages measure pure
# per-record overhead (the scaling worst case); real crawl pages are
# KBs, where member inflate + byte movement dominates. PAD bytes of
# deterministic md5-chain filler (incompressible, so inflate cost is
# honest) go in <head> so text extraction semantics stay identical.
PAGE_PAD = int(os.environ.get("SCALING_WARC_PAD", "2048"))
REPS = int(os.environ.get("SCALING_REPS", "3"))
SPLIT_BYTES = int(os.environ.get("SCALING_WARC_SPLIT", str(256 * 1024)))
QUIET_LOAD = float(os.environ.get("SCALING_QUIET_LOAD", "2.5"))
QUIET_WAIT_S = int(os.environ.get("SCALING_QUIET_WAIT_S", "180"))


def corpus_dir() -> str:
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"georaster_warc_scale_{N_DOCS}_{N_SHARDS}_{PAGE_PAD}",
    )


def ensure_corpus(spark) -> list[str]:
    """Write the shard set once, one shard per executor task (the
    writer is deterministic, so concurrent/bench re-runs converge)."""
    d = corpus_dir()
    os.makedirs(d, exist_ok=True)
    paths = [os.path.join(d, f"scale-{s:05d}.warc.gz") for s in range(N_SHARDS)]
    if all(os.path.exists(p) and os.path.exists(p + ".cdx.jsonl") for p in paths):
        return paths
    per = N_DOCS // N_SHARDS

    def kernel(batches):
        import pandas as pd

        from georaster_spark.datagen import warc_doc_fields
        from georaster_spark.sources.warc import http_response_bytes, write_warc

        import hashlib

        def pad(i: int) -> bytes:
            if not PAGE_PAD:
                return b""
            blocks, out = (PAGE_PAD + 31) // 32, []
            seed = str(i).encode()
            for b in range(blocks):
                seed = hashlib.md5(seed + str(b).encode()).digest()
                out.append(seed.hex().encode())
            return b"<head><!--" + b"".join(out)[:PAGE_PAD] + b"--></head>"

        def records(lo, hi):
            for i in range(lo, hi):
                url, ts, html, lang = warc_doc_fields(i)
                html = html.replace(b"<html>", b"<html>" + pad(i), 1)
                date = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(ts))
                yield (
                    "response",
                    {
                        "WARC-Date": date,
                        "WARC-Target-URI": url,
                        "WARC-Record-ID": f"<urn:uuid:{i:032x}>",
                        "WARC-Identified-Content-Language": lang,
                        "Content-Type": "application/http; msgtype=response",
                    },
                    http_response_bytes(html),
                )

        for pdf in batches:
            done = []
            for s in pdf["shard"]:
                s = int(s)
                p = paths[s]
                if not (
                    os.path.exists(p) and os.path.exists(p + ".cdx.jsonl")
                ):
                    tmp = f"{p}.tmp.{os.getpid()}"
                    write_warc(tmp, records(s * per, (s + 1) * per))
                    os.replace(tmp + ".cdx.jsonl", p + ".cdx.jsonl")
                    os.replace(tmp, p)
                done.append(s)
            yield pd.DataFrame({"shard": done})

    (
        spark.createDataFrame([(s,) for s in range(N_SHARDS)], "shard int")
        .repartition(N_SHARDS)
        .mapInPandas(kernel, schema="shard int")
        .count()
    )
    return paths


def run_level(cores: int) -> dict:
    from pyspark.sql import functions as F

    from georaster_spark.session import get_spark

    spark = get_spark(
        f"warc_scale_{cores}",
        cores=cores,
        shuffle_partitions=cores,
        extra_conf={
            "spark.driver.extraJavaOptions": (
                f"-XX:+UseParallelGC -XX:ActiveProcessorCount={cores}"
            )
        },
    )
    paths = ensure_corpus(spark)

    from georaster_spark.sources.warc import warc_splits_df

    def pipeline() -> tuple[float, int, int]:
        """Full parse path, 100-TB shape: page bytes never leave the
        task (a real ingest writes them to columnar files
        per-partition; shipping every payload through one host's
        memory bus is a local[SINGLE-HOST] artifact, and measuring it
        fakes sub-linear scaling of the CODE). Each split parses +
        extracts + hashes in its kernel and emits one stats row."""
        import hashlib as _hl

        from georaster_spark.sources.warc import (
            iter_warc_members,
            parse_warc_member,
        )

        splits = warc_splits_df(spark, paths, split_bytes=SPLIT_BYTES)
        splits = splits.repartition(cores * 4, F.col("path"), F.col("offset"))

        def kernel(batches):
            import pandas as pd

            for pdf in batches:
                n = b = h = 0
                for row in pdf.itertuples(index=False):
                    with open(row.path, "rb") as f:
                        f.seek(row.offset)
                        buf = f.read(row.length)
                    for off, _l, rec in iter_warc_members(
                        buf, row.path, int(row.offset)
                    ):
                        rt, url, ts, lang, st, ct, payload = (
                            parse_warc_member(rec, row.path, off)
                        )
                        if rt != "response":
                            continue
                        # extracted text (bytes-level twin of the
                        # engine's regexp) + 60-bit md5, mod a prime
                        # so the sum fits int64 at any corpus size
                        i0 = payload.find(b"<body>") + 6
                        i1 = payload.rfind(b"</body>")
                        text = payload[i0:i1]
                        n += 1
                        b += len(payload)
                        h += (
                            int(_hl.md5(text).hexdigest()[:15], 16)
                            % 1_000_000_007
                        )
                yield pd.DataFrame({"n": [n], "b": [b], "h": [h]})

        agg = splits.mapInPandas(kernel, schema="n long, b long, h long")
        t0 = time.time()
        row = agg.agg(
            F.sum("n").alias("n"), F.sum("b").alias("b"), F.sum("h").alias("h")
        ).collect()[0]
        return time.time() - t0, int(row["n"]), int(row["h"])

    pipeline()  # warmup: python worker pool, JIT
    walls, loads = [], []
    n = h = None
    for _ in range(REPS):
        t0 = time.time()
        while os.getloadavg()[0] > QUIET_LOAD and time.time() - t0 < QUIET_WAIT_S:
            time.sleep(10)
        loads.append(round(os.getloadavg()[0], 1))
        wall, n, h = pipeline()
        walls.append(wall)
    wall = min(walls)
    return {
        "cores": cores,
        "n_records": n,
        "text_hash_sum": h,  # row-identity check across levels
        "wall_sec": round(wall, 3),
        "all_walls": [round(w, 2) for w in walls],
        "loadavg_at_rep": loads,
        "records_per_sec": round(n / wall, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    if args.cores:
        print(json.dumps(run_level(args.cores)))
        return

    lo = int(os.environ.get("SCALING_N_CORES", "4"))
    hi = lo * 4
    results = {}
    for cores in (lo, hi):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cores", str(cores)],
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        r = json.loads(out.stdout.strip().splitlines()[-1])
        print(r, file=sys.stderr)
        results[cores] = r
    eff = round(
        results[hi]["records_per_sec"] / results[lo]["records_per_sec"] / (hi / lo), 3
    )
    identical = results[lo]["text_hash_sum"] == results[hi]["text_hash_sum"]
    summary = {
        "metric": "warc-ingest records/sec, N vs 4N",
        "n_records": results[lo]["n_records"],
        "levels": results,
        "efficiency": eff,
        "row_identity_across_levels": identical,
    }
    print(json.dumps(summary))
    bench = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"
    )
    if os.path.isdir(bench):
        with open(os.path.join(bench, "warc_scale.json"), "w") as f:
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
