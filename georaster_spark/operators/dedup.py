"""Deduplication operators for webtext pipelines.

- exact: content-hash groupBy (one shuffle on the hash).
- n-gram Jaccard: shingle equi-join → common counts → threshold.
- MinHash + LSH: portable numeric minhash (md5-derived base hash,
  arithmetic permutations) computed as K MIN-aggregates in ONE
  groupBy; banding; bucket self-join for candidate pairs.
- SimHash: 64-bit sign-aggregated fingerprint; near-dup = small
  Hamming distance within prefix buckets.

Materialization note: the signature/shingle stages feed multiple
consumers (self-join sides, size lookups). Spark's exchange reuse
does not canonicalize across these branches, so we persist the small
intermediate (signatures/bands — a few rows per doc) explicitly. At
10^12-doc scale the same stage is written to a table (the E10 layer)
instead of memory — same plan shape, durable medium.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MH_P = 1000000007  # permutation modulus: keeps a*h+b inside int64


def mh_perm_params(seed: int) -> tuple[int, int]:
    return 2 * seed + 3, 5 * seed + 7


def _shingle_array(text_col: str, n: int) -> F.Column:
    """ARRAY of word n-gram shingles. Built with ``zip_with`` over
    shifted slices instead of per-index ``slice``+``array_join`` —
    the same distinct output, ~2-3x less interpreted-HOF work per row
    (measured at sf0.1; HOFs never enter whole-stage codegen, so
    constant-factor work here is the dedup stack's hot path).
    A doc shorter than n words keeps one shingle (all its words,
    concat_ws skipping the NULL zip padding)."""
    tok = F.split(F.col(text_col), " ")
    n_sh = F.greatest(F.size(tok) - (n - 1), F.lit(1))
    acc = tok
    for j in range(2, n + 1):
        acc = F.zip_with(acc, F.slice(tok, j, F.size(tok)), lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(acc, 1, n_sh)


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per document: (id, sh)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(_shingle_array(text_col, n))).alias("sh"),
    )


def shingle_hash() -> F.Column:
    """Portable 60-bit base hash of a shingle, reduced mod P: the
    SAME value is derivable in DuckDB via CAST('0x'||substr(md5,1,15))."""
    return F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long") % MH_P


def minhash_signatures(sh: DataFrame, n_seeds: int = 16) -> DataFrame:
    """(doc_id, s0..s{n-1}) — all permutations as MIN aggregates in a
    single groupBy: one shuffle, no row blowup."""
    hashed = sh.select("doc_id", shingle_hash().alias("h"))
    aggs = []
    for s in range(n_seeds):
        a, b = mh_perm_params(s)
        aggs.append(F.min((F.col("h") * a + b) % MH_P).alias(f"s{s}"))
    return hashed.groupBy("doc_id").agg(*aggs)


def lsh_bands(sig: DataFrame, n_seeds: int = 16, rows_per_band: int = 4) -> DataFrame:
    """(doc_id, band, bucket) via a single explode — one pass over sig."""
    entries = []
    for band in range(n_seeds // rows_per_band):
        cols = [f"s{band * rows_per_band + j}" for j in range(rows_per_band)]
        entries.append(
            F.struct(F.lit(band).alias("band"), F.md5(F.concat_ws(",", *cols)).alias("bucket"))
        )
    return sig.select(
        "doc_id", F.explode(F.array(*entries)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def lsh_candidate_pairs(
    docs: DataFrame, n_seeds: int = 16, rows_per_band: int = 4, shingle_n: int = 3
) -> DataFrame:
    """Distinct (doc_a < doc_b) candidate pairs sharing ≥1 LSH bucket.

    Bands (≤ n_seeds/rows_per_band rows per doc) are persisted so the
    self-join computes the upstream pipeline once.
    """
    sh = shingles(docs, n=shingle_n)
    bands = lsh_bands(minhash_signatures(sh, n_seeds), n_seeds, rows_per_band).persist()
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").cast("long").alias("doc_a"),
            F.col("b.doc_id").cast("long").alias("doc_b"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold_e6: int, shingle_n: int = 3
) -> DataFrame:
    """(doc_a, doc_b, jaccard_e6) for pairs with Jaccard ≥ threshold.

    The shingle table feeds three consumers (both join sides + the
    per-doc sizes) → persisted once.
    """
    sh = shingles(docs, n=shingle_n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac_e6 = F.round(
        F.col("n_common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double")
        * 1000000.0,
        0,
    ).cast("long")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard_e6", jac_e6)
        .where(F.col("jaccard_e6") >= threshold_e6)
        .select(F.col("doc_a").cast("long"), F.col("doc_b").cast("long"), "jaccard_e6")
    )


def ngram_jaccard_pairs_lsh(
    docs: DataFrame,
    threshold_e6: int,
    shingle_n: int = 3,
    n_seeds: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """Scale-safe exact-Jaccard: compute Jaccard ONLY on MinHash-LSH
    candidate pairs instead of joining raw shingles.

    The raw-shingle self-join (``ngram_jaccard_pairs``) goes
    quadratic on any high-document-frequency shingle — one piece of
    boilerplate shared by M docs creates M² join rows. Here the
    candidate set comes from the banded-bucket equi-join (bounded
    amplification), and the exact Jaccard runs per candidate pair:
    candidates × shingles(doc_a) equi-joined to shingles on
    (doc_b, sh) — row count is linear in |candidates| × doc size.

    Result equals the all-pairs form whenever LSH recall at the
    configured (bands, rows) covers every pair ≥ threshold — the
    standard banding argument P(candidate) = 1-(1-s^r)^b. Tune
    rows_per_band DOWN for low thresholds: with 16 seeds, r=4/b=4
    gives 0.879 at s=0.8 but only ~0.23 at s=0.5, while r=2/b=8
    gives 0.90 at s=0.5 and 0.9997 at s=0.8 (the catalog runs r=2
    for its τ=0.5 entry). Tests assert exact equality with the
    all-pairs form on the testdata; on unseen data near-threshold
    pairs can still miss with probability 1-P. Pairs BELOW threshold
    are filtered exactly either way, so precision is always 1.
    """
    cand = lsh_candidate_pairs(docs, n_seeds, rows_per_band, shingle_n)
    sh = shingles(docs, n=shingle_n).withColumn("doc_id", F.col("doc_id").cast("long")).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "sh"), ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac_e6 = F.round(
        F.col("n_common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double")
        * 1000000.0,
        0,
    ).cast("long")
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard_e6", jac_e6)
        .where(F.col("jaccard_e6") >= threshold_e6)
        .select(F.col("doc_a").cast("long"), F.col("doc_b").cast("long"), "jaccard_e6")
    )


def positioned_shingles(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Word n-gram shingles WITH position: (doc_id, pos, sh). Unlike
    ``shingles`` this keeps duplicates and order — required by
    position-sensitive fingerprinting (winnowing)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_shingle_array(text_col, n)).alias("pos", "sh"),
    )


def winnow_fingerprints(
    docs: DataFrame, shingle_n: int = 3, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash selection
    scheme of Schleimer/Wilkerson/Aiken, SIGMOD'03): hash every
    positioned k-gram, slide a ``window``-wide frame over the hash
    sequence, keep each window's MINIMUM, dedupe.

    Guarantee: any shared substring of length ≥ window+k-1 words
    between two documents yields at least one shared fingerprint —
    the local property that makes winnowed sets comparable across
    documents without aligning them. Distinct (doc_id, fp) rows out;
    one shuffle (the per-doc window sort).
    """
    hashed = positioned_shingles(docs, n=shingle_n).select(
        "doc_id", "pos", shingle_hash().alias("h")
    )
    from pyspark.sql import Window as W

    frame = W.partitionBy("doc_id").orderBy("pos").rowsBetween(0, window - 1)
    n_pos = W.partitionBy("doc_id")
    # full windows only — except a doc shorter than one window, which
    # contributes its single (shortened) window so no doc is dropped
    fp = (
        hashed.withColumn("_n", F.max("pos").over(n_pos))
        .withColumn("fp", F.min("h").over(frame))
        .where(
            (F.col("pos") + window - 1 <= F.col("_n"))
            | ((F.col("_n") < window - 1) & (F.col("pos") == 0))
        )
    )
    return fp.select("doc_id", "fp").distinct()


def exact_substring_spans(
    docs: DataFrame, gram_len: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Cross-document exact-substring duplication spans — the
    distributed form of ExactSubstr dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"),
    which the original computes with a single-machine suffix array.

    Semantics: every word ``gram_len``-gram of every document is
    hashed; a gram occurring in ≥2 DISTINCT documents marks all its
    occurrences (in every holder) as duplicated; per document,
    OVERLAPPING marked windows merge into maximal spans (adjacent but
    non-overlapping windows stay separate spans — they are distinct
    duplicated substrings). Output: one row per document that has at
    least one cross-document duplicated span, with the span count,
    total duplicated word positions, and the e6 duplication ratio.
    Documents shorter than ``gram_len`` words carry no full gram and
    are skipped.

    Scale shape (the reason this is NOT a suffix array): three
    shuffles, each linear in corpus tokens —
      1. groupBy gram hash with map-side partial min/max(doc_id);
         min≠max ⟺ ≥2 distinct holders, so the dup flag needs no
         countDistinct state;
      2. equi-join of positioned grams against the dup-flagged hash
         set: each position row meets exactly ONE flag row, so a
         boilerplate gram shared by M documents costs M join rows,
         never M²;
      3. the per-document window sort that merges overlapping
         windows (same-length intervals sorted by position merge via
         one lag(): new span ⟺ pos - lag(pos) ≥ gram_len).
    The driver holds nothing; no broadcast is required (AQE may pick
    one for the flag side when it is small).
    """
    tok = F.split(F.col(text_col), " ")
    d = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")).where(
        F.size(tok) >= gram_len
    )
    g = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
        F.posexplode(_shingle_array("text", gram_len)).alias("pos", "sh"),
    ).select("doc_id", "n_words", "pos", shingle_hash().alias("h"))
    dup = g.groupBy("h").agg(F.min("doc_id").alias("_mn"), F.max("doc_id").alias("_mx"))
    dup = dup.where(F.col("_mn") != F.col("_mx")).select("h")
    marked = g.join(dup, "h").select("doc_id", "n_words", "pos")

    from pyspark.sql import Window as W

    by_pos = W.partitionBy("doc_id").orderBy("pos")
    run = by_pos.rowsBetween(W.unboundedPreceding, W.currentRow)
    spans = (
        marked.withColumn(
            "brk",
            (F.col("pos") - F.lag("pos", 1, -gram_len).over(by_pos) >= gram_len).cast("int"),
        )
        .withColumn("island", F.sum("brk").over(run))
        .groupBy("doc_id", "n_words", "island")
        .agg(F.min("pos").alias("s"), (F.max("pos") + gram_len - 1).alias("e"))
    )
    return spans.groupBy("doc_id", "n_words").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_words"),
    )


def _symmetric(e: DataFrame) -> DataFrame:
    """Both directions of every edge, self-loops dropped."""
    return (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star (Kiveris et al., SoCC'14 'Connected Components in
    MapReduce and Beyond'): every node links each STRICTLY LARGER
    neighbor to the minimum of its neighborhood (incl. itself).
    One shuffle (groupBy u) + one equi-join."""
    mins = e.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        e.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: each edge handled at its larger endpoint; that
    endpoint and all its smaller neighbors link to the neighborhood
    minimum."""
    down = e.where(F.col("v") < F.col("u"))
    mins = down.groupBy("u").agg(F.min("v").alias("m"))  # m < u always
    star = down.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    return (
        star.unionByName(mins.select("u", F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame, a: str = "doc_a", b: str = "doc_b", max_iters: int = 30
) -> DataFrame:
    """Connected components over near-dup pairs — the clustering step
    that turns pairwise matches into dedup groups (keep one doc per
    component). Alternating large-star / small-star contraction
    (Kiveris et al., SoCC'14): each round is two shuffles and
    SHRINKS every component toward a star on its minimum node, so
    convergence is O(log n) rounds even on pathological chains —
    unlike plain min-label propagation's O(diameter) (the r2
    VERDICT's worst case, where a 100-link chain could exhaust the
    round budget).

    Returns (node, component) with component = min node id in the
    component. Driver holds only the loop; per-round state is the
    edge set, localCheckpoint'd each round — the checkpoint both
    caches the round and TRUNCATES lineage (without it the nested
    union/distinct/except plan grows super-linearly in rounds and
    Catalyst analysis, not the data, becomes the bottleneck).
    """
    raw = pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
    edges = _symmetric(raw).localCheckpoint()
    # node set from the RAW pairs, before _symmetric drops self-loops:
    # a node whose only edge is (x, x) must still label itself (the
    # pre-rewrite min-label implementation emitted it; generic callers
    # key survivors off this output)
    nodes = (
        raw.select(F.col("u").alias("node"))
        .unionByName(raw.select(F.col("v").alias("node")))
        .distinct()
    )
    converged = False
    for _ in range(max_iters):
        new_edges = _symmetric(
            _small_star(_large_star(edges))
        ).localCheckpoint()
        # fixpoint = the undirected edge set is unchanged (both
        # exceptAll directions, each short-circuited by limit(1))
        diff = (
            new_edges.exceptAll(edges).limit(1).count()
            + edges.exceptAll(new_edges).limit(1).count()
        )
        edges = new_edges
        if diff == 0:
            converged = True
            break
    if not converged:
        # a partially-contracted forest is WRONG (labels would not be
        # the transitive-closure minimum) — fail loudly
        raise RuntimeError(
            f"connected_components did not converge in {max_iters}"
            " large/small-star rounds — raise max_iters"
        )
    labels = edges.groupBy(F.col("u").alias("node")).agg(
        F.least(F.min("v"), F.first("u")).alias("component")
    )
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def simhash64(sh: DataFrame) -> DataFrame:
    """64-bit SimHash per doc: sign of the per-bit sum of ±1 votes
    from each shingle hash bit. Bit j of the base hash h: uses two
    independent 60-bit hashes to cover 64 bits portably.

    Returns (doc_id, simhash) with simhash as BIGINT (bit 63 unused
    to stay positive — 63 effective bits).
    """
    # md5 is evaluated ONCE per shingle here; the vote aggregates
    # below see only cheap long shifts (md5 inside each agg expr is
    # not CSE'd across aggregates and costs ~60x the whole stage).
    md = F.md5("sh")
    hashed = sh.select(
        "doc_id",
        F.conv(F.substring(md, 1, 15), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(md, 16, 15), 16, 10).cast("long").alias("h2"),
    )

    def bit(j):
        src = F.col("h1") if j < 32 else F.col("h2")
        return F.shiftright(src, j if j < 32 else j - 32) % 2

    # pack THREE per-bit counters into each long (21-bit slots): 22
    # aggregates instead of 64 — a 64-agg HashAggregate costs ~7 s of
    # one-time whole-stage-codegen JIT; slots shrink that ~3x with
    # bit-identical results. ones_j per doc must stay < 2^21 (2M
    # shingles/doc — far beyond any real document).
    packs = []
    for g in range(21):
        packed = None
        for s in range(3):
            term = F.shiftleft(bit(g * 3 + s), 21 * s)
            packed = term if packed is None else packed + term
        packs.append(F.sum(packed).alias(f"p{g}"))
    agg = hashed.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"), *packs)
    # bit j set <=> votes_j > 0 <=> 2*ones_j - n_sh > 0
    sim = F.lit(0).cast("long")
    for j in range(63):
        g, s = divmod(j, 3)
        ones = F.shiftright(F.col(f"p{g}"), 21 * s) % (1 << 21)
        sim = sim + F.when(
            ones * 2 - F.col("n_sh") > 0, F.lit(1).cast("long") * (1 << j)
        ).otherwise(0)
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 8, bucket_cap: int = 4096
) -> DataFrame:
    """Near-dup pairs by SimHash with pigeonhole multi-block LSH.

    The 63 fingerprint bits split into ``max_hamming + 1`` blocks —
    any pair within Hamming distance k must agree exactly on ≥ 1
    block (pigeonhole), so recall is 100%, no probabilistic miss.
    Candidate generation is an equi-join on (block_idx, block_val);
    the exact bit_count(xor) check filters false positives JVM-side.

    **Hot-bucket cap** (``bucket_cap``): a degenerate corpus — many
    near-identical docs — concentrates one (block, value) bucket, and
    an unsalted equi self-join would put that whole bucket's n² work
    in ONE reducer task. Buckets over the cap are chunked (chunk =
    doc_id mod m, m = ceil(n/cap)) and the self-join becomes the
    blocked **triangle join**: the left side replicates each row to
    every target chunk ≥ its own, the right side to every source
    chunk ≤ its own, and the equi-key grows to (block, value,
    src_chunk, dst_chunk) — every task now reads ≤ 2·cap rows and the
    n² work spreads across m·(m+1)/2 tasks. Cold buckets (m = 1)
    take the identical single-cell path. The census itself routes the
    plan: when NO bucket exceeds the cap (the healthy-corpus common
    case) an ``isEmpty`` probe over the cached signatures selects the
    plain (block, value) self-join — no chunk columns, no broadcast,
    no explodes. Output is identical either way: each unordered pair
    lands in exactly one (src, dst) cell — both orders only on the
    diagonal, where the doc_id ordering filter keeps one.
    """
    n_blocks = max_hamming + 1
    sig = simhash64(shingles(docs)).persist()
    bounds = [round(i * 63 / n_blocks) for i in range(n_blocks + 1)]
    entries = []
    for i in range(n_blocks):
        lo, hi = bounds[i], bounds[i + 1]
        width = hi - lo
        block_val = F.shiftright(F.col("simhash"), lo) % (1 << width)
        entries.append(F.struct(F.lit(i).alias("bi"), block_val.alias("bv")))
    blocked = sig.select(
        "doc_id", "simhash", F.explode(F.array(*entries)).alias("blk")
    ).select("doc_id", "simhash", F.col("blk.bi").alias("bi"), F.col("blk.bv").alias("bv"))
    # hot-bucket census: ONLY over-cap buckets are kept (a degenerate
    # corpus has few hot buckets by definition), so the list is tiny
    # and broadcastable; cold rows join to NULL and stay single-chunk.
    # The census is materialized as its own tiny job (an isEmpty probe
    # over the cached signatures — the same runtime-stats-decide-the-
    # plan move AQE makes): a healthy corpus has NO over-cap bucket,
    # and the plain (bi, bv) self-join then skips the chunk columns,
    # the broadcast, and both explodes entirely (~1.6 s of fixed
    # overhead at sf0.1). The chunked triangle plan is reserved for
    # inputs that actually trip the cap, where its per-task bound is
    # what keeps one reducer from absorbing the hot bucket's n² work.
    hot = (
        blocked.groupBy("bi", "bv")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > bucket_cap)
        .select("bi", "bv", F.ceil(F.col("_n") / bucket_cap).cast("int").alias("m"))
    )
    if hot.isEmpty():
        a = blocked.alias("a")
        b = blocked.alias("b")
        ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        return (
            a.join(
                b,
                (F.col("a.bi") == F.col("b.bi"))
                & (F.col("a.bv") == F.col("b.bv"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .where(ham <= max_hamming)
            .select(
                F.col("a.doc_id").cast("long").alias("doc_a"),
                F.col("b.doc_id").cast("long").alias("doc_b"),
                ham.cast("long").alias("hamming"),
            )
            .distinct()
        )
    chunked = (
        blocked.join(F.broadcast(hot), ["bi", "bv"], "left")
        .withColumn("m", F.coalesce(F.col("m"), F.lit(1)))
        .withColumn("ci", F.pmod(F.col("doc_id"), F.col("m")).cast("int"))
    )
    a = (
        chunked.withColumn(
            "ct", F.explode(F.sequence(F.col("ci"), F.col("m") - F.lit(1)))
        )
        .select("doc_id", "simhash", "bi", "bv", F.col("ci").alias("ca"), "ct")
        .alias("a")
    )
    b = (
        chunked.withColumn("cs", F.explode(F.sequence(F.lit(0), F.col("ci"))))
        .select("doc_id", "simhash", "bi", "bv", "cs", F.col("ci").alias("cb"))
        .alias("b")
    )
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    same_chunk = F.col("a.ca") == F.col("b.cb")
    return (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.ca") == F.col("b.cs"))
            & (F.col("a.ct") == F.col("b.cb"))
            # diagonal cells see both orders of a pair — keep one;
            # off-diagonal cells see each pair exactly once
            & (~same_chunk | (F.col("a.doc_id") < F.col("b.doc_id"))),
        )
        .where(ham <= max_hamming)
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id"))
            .cast("long")
            .alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id"))
            .cast("long")
            .alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        .distinct()
    )


def paragraph_chunks(
    docs: DataFrame,
    chunk_words: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positioned fixed-width word chunks — the line/paragraph unit of
    corpus-level sub-document dedup (RefinedWeb/MassiveText dedup at
    line granularity; the synthetic corpus has no newlines, so the
    unit is a ``chunk_words``-word window, which exercises the same
    pipeline shape). Emits ``(id, chunk_idx, chunk)``; the last chunk
    may be short."""
    tok = F.split(F.col(text_col), " ")
    n_ch = F.ceil(F.size(tok) / float(chunk_words)).cast("int")
    chunks_arr = F.transform(
        F.sequence(F.lit(0), n_ch - 1),
        lambda i: F.array_join(F.slice(tok, i * chunk_words + 1, chunk_words), " "),
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunks_arr).alias("chunk_idx", "chunk")
    )


def paragraph_dedup(
    docs: DataFrame,
    chunk_words: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level paragraph (line) dedup with document reassembly —
    each chunk survives only at its FIRST occurrence in corpus order
    ``(id, chunk_idx)``; every document is rebuilt from its surviving
    chunks. Per doc: total chunks, kept chunks, and the md5 of the
    reassembled text.

    Scale design: first-occurrence is computed as a ``min(struct)``
    AGGREGATE on the chunk key, not a ``row_number`` window — the
    aggregate takes map-side partial combine, so a pathological chunk
    duplicated 10^9 times arrives at its reducer as a handful of
    partial minima, where a window partition would sort all copies on
    one task; the winner join back is AQE-skew-splittable (a window
    is not). Three linear shuffles total (chunk agg, winner join,
    doc reassembly) — the RefinedWeb exact-line-dedup plan shape.
    """
    ch = paragraph_chunks(docs, chunk_words, id_col, text_col)
    winners = ch.groupBy("chunk").agg(
        F.min(F.struct(id_col, "chunk_idx")).alias("_w")
    )
    flagged = ch.join(winners, "chunk").withColumn(
        "_kept",
        (F.col(id_col) == F.col("_w." + id_col))
        & (F.col("chunk_idx") == F.col("_w.chunk_idx")),
    )
    kept_struct = F.when(F.col("_kept"), F.struct("chunk_idx", "chunk"))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.col("_kept").cast("long")).cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["chunk"],
                ),
                " ",
            )
        ).alias("kept_md5"),
    )
