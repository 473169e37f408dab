"""Dedup operator tests: planted duplicates must be found."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from georaster_spark.operators.dedup import (
    lsh_candidate_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_near_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    """60 base docs + planted near/exact duplicates."""
    base = [
        (i, " ".join(f"w{(i * 7 + k) % 97}" for k in range(40))) for i in range(60)
    ]
    # exact dup of doc 3, near dup of doc 5 (1 word changed ->
    # jaccard ≈ 35/41 ≈ 0.85; with the fixed minhash seeds the LSH
    # outcome is deterministic and was verified to fire)
    rows = base + [(100, base[3][1])]
    words5 = base[5][1].split()
    words5[10] = "CHANGED"
    rows.append((101, " ".join(words5)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingles_count(spark, docs):
    sh = shingles(docs, n=3)
    n_per_doc = {r.doc_id: r.n for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert n_per_doc[0] == 38  # 40 tokens -> 38 distinct trigrams


def test_lsh_finds_planted_dups(spark, docs):
    pairs = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(docs).collect()}
    assert (3, 100) in pairs
    assert (5, 101) in pairs


def test_jaccard_finds_and_scores(spark, docs):
    out = {
        (r.doc_a, r.doc_b): r.jaccard_e6
        for r in ngram_jaccard_pairs(docs, threshold_e6=500000).collect()
    }
    assert out[(3, 100)] == 1000000  # exact dup -> jaccard 1.0
    assert 500000 <= out[(5, 101)] < 1000000


def test_simhash_near_pairs(spark, docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_pairs(docs, max_hamming=10).collect()}
    assert pairs.get((3, 100)) == 0  # identical fingerprint
    assert (5, 101) in pairs
