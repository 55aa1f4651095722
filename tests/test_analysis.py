"""Semantic unit tests for the training-data analysis operators
(dedup / similarity / text stats) on tiny in-memory frames — complements
the DuckDB oracle parity checks in test_entry.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wolf_quake_spark.analysis.dedup import (
    candidate_pairs,
    exact_duplicate_groups,
    ngram_jaccard,
    simhash,
    simhash64,
    simhash64_neardup_pairs,
    word_shingles,
)
from wolf_quake_spark.analysis.similarity import (
    cosine_scores,
    derived_n_buckets,
    ivf_search,
    neardup_pairs,
    topk,
)
from wolf_quake_spark.analysis.textstats import bpe_token_count, lang_id, token_count


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different content about spark engines"),
        (5, ""),  # empty doc
        (6, "short"),  # < shingle width
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_groups(docs):
    groups = {r["keeper_doc_id"]: r["n_copies"] for r in exact_duplicate_groups(docs).collect()}
    assert groups[1] == 2  # docs 1+2 collapse
    assert groups[3] == 1


def test_shingles_skip_short_docs(docs):
    sh = word_shingles(docs, n=3)
    ids = {r["doc_id"] for r in sh.select("doc_id").distinct().collect()}
    assert 5 not in ids and 6 not in ids
    # 9 words → 7 trigrams, 'the quick brown ... the lazy dog' has no repeats
    assert sh.filter(F.col("doc_id") == 1).count() == 7


def test_simhash_identity_and_distance(docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert fp[1] == fp[2]  # identical text → identical fingerprint
    assert 0 <= fp[1] < (1 << 16)
    # near-dup differs in few bits; unrelated doc differs in more
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(fp[1], fp[3]) <= ham(fp[1], fp[4])
    assert 5 not in fp  # empty doc has no features


def test_lsh_pairs_and_jaccard(docs):
    pairs = candidate_pairs(docs)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # exact dups always collide in every band
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard(docs, pairs).collect()}
    assert jac[(1, 2)] == 1.0
    if (1, 3) in jac:  # last-word change: 7 shingles each, 6 shared, union 8
        assert abs(jac[(1, 3)] - 6 / 8) < 1e-12


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),   # identical to 0
        (2, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
        (4, [0.0, 0.0, 0.0, 0.0]),   # zero vector
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_scores(vecs):
    cos = {r["vec_id"]: r["cosine"] for r in cosine_scores(vecs, [1.0, 0.0, 0.0, 0.0]).collect()}
    assert cos[0] == 1.0 and cos[1] == 1.0
    assert 0.9 < cos[2] < 1.0
    assert cos[3] == -1.0
    assert cos[4] == 0.0  # zero norm guarded


def test_topk_deterministic_ties(vecs):
    rows = topk(vecs, [1.0, 0.0, 0.0, 0.0], k=2).collect()
    assert [r["vec_id"] for r in rows] == [0, 1]  # tie broken by vec_id asc


def test_neardup_pairs(vecs):
    rows = neardup_pairs(vecs, top=10).collect()
    sims = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in rows}
    assert sims[(0, 1)] == 1.0
    # opposite-sign vec 3 lands in a different IVF bucket → never paired with 0
    assert (0, 3) not in sims


def test_simhash64_identity_and_hex(docs):
    rows = {r["doc_id"]: r for r in simhash64(docs).collect()}
    for i in range(4):
        assert rows[1][f"sh{i}"] == rows[2][f"sh{i}"]  # identical text
        assert 0 <= rows[1][f"sh{i}"] < (1 << 16)
    assert rows[1]["simhash_hex"] == rows[2]["simhash_hex"]
    assert len(rows[1]["simhash_hex"]) == 16
    assert rows[4]["simhash_hex"] != rows[1]["simhash_hex"]  # unrelated doc
    assert 5 not in rows  # empty doc has no features


def test_simhash64_neardup_pairs_complete_for_exact_dups(docs):
    # identical docs have Hamming 0 → guaranteed by the 4-band pigeonhole
    rows = {(r["doc_a"], r["doc_b"]): r["hamming"]
            for r in simhash64_neardup_pairs(docs, max_hamming=3).collect()}
    assert rows[(1, 2)] == 0
    # verify every reported distance against a Python recomputation
    fp = {r["doc_id"]: [r[f"sh{i}"] for i in range(4)] for r in simhash64(docs).collect()}
    for (a, b), h in rows.items():
        assert h == sum(bin(x ^ y).count("1") for x, y in zip(fp[a], fp[b]))
        assert h <= 3


def test_derived_n_buckets_scales_linearly():
    # occupancy stays ≤ target as n grows; count is a power of two
    assert derived_n_buckets(500) == 8
    assert derived_n_buckets(2000) == 32
    for n in (100, 1000, 10_000, 1_000_000, 100_000_000):
        nb = derived_n_buckets(n)
        assert nb & (nb - 1) == 0
        assert n / nb <= 64  # bounded occupancy — the 2^24 ceiling binds
        # only past ~10^9 vectors (one sign bit per embedding dim)
    assert derived_n_buckets(10**12) == 1 << 24


def test_srp_derived_width_tracks_corpus_size():
    from wolf_quake_spark.analysis.similarity import srp_derived_width

    assert srp_derived_width(500) == 4  # floored — bands must discriminate
    assert srp_derived_width(2000) == 5
    for n in (10_000, 1_000_000, 100_000_000):
        w = srp_derived_width(n)
        assert n / (1 << w) <= 64 or w == 16  # occupancy bounded to the cap
    assert srp_derived_width(10**12) == 16


def _make_ppm(w, h, comment=True):
    header = b"P6\n" + (b"# test comment\n" if comment else b"") + f"{w} {h}\n255\n".encode()
    raster = bytes((x * 7 + 3) % 256 for x in range(w * h * 3))
    return header + raster


def test_decode_ppm_real_bytes():
    from wolf_quake_spark.analysis.multimodal import decode_ppm

    w, h, frames, feat = decode_ppm(_make_ppm(5, 4))
    assert (w, h, frames) == (5, 4, 1)
    assert len(feat) == 8 and all(0.0 <= f <= 255.0 for f in feat)
    # width/height come from the header bytes, not payload length
    assert decode_ppm(_make_ppm(31, 2, comment=False))[:2] == (31, 2)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n5 4\n255\n\x00")  # truncated raster
    with pytest.raises(ValueError):
        decode_ppm(b"GIF89a")


def test_fake_mode_total_on_ppm_prefixed_text():
    # arbitrary document text starting with P6/P5 must NOT crash fake mode
    # (regression: raw magic sniff routed it into the strict PPM parser)
    from wolf_quake_spark.analysis.multimodal import _decode

    payload = "P6 hello world".encode()
    w, h, frames, feat = _decode(payload, "image/fake", fake=True)
    n = len(payload)
    assert (w, h, frames) == (16 + n % 64, 16 + (n // 64) % 64, 1)  # fake formula
    with pytest.raises(ValueError):
        _decode(payload, "image/fake", fake=False)  # strict: magic sniff applies


def test_extract_features_decodes_ppm_in_spark(spark):
    from wolf_quake_spark.analysis.multimodal import decode_ppm, extract_features

    ppm = _make_ppm(9, 3)
    rows = [(1, "image/ppm", bytearray(ppm), len(ppm), "x")]
    media = spark.createDataFrame(
        rows,
        "doc_id long, media_type string, payload binary, byte_len long, payload_sha string",
    )
    got = extract_features(media, fake=False).collect()[0]
    w, h, frames, feat = decode_ppm(ppm)
    assert (got["width"], got["height"], got["n_frames"]) == (w, h, frames)
    assert [round(f, 4) for f in got["feature"]] == [round(f, 4) for f in feat]


def test_resize_ppm_real_pixels():
    from wolf_quake_spark.analysis.multimodal import decode_ppm, resize_ppm

    src = _make_ppm(8, 6)
    out = resize_ppm(src, 2)
    w, h, _, _ = decode_ppm(out)
    assert (w, h) == (4, 3)
    # nearest-neighbor: output pixel (0,0) is source pixel (0,0); (1,0) is
    # source (2,0) — raster formula (x*7+3)%256 per byte
    raster = out.split(b"255\n", 1)[1]
    assert raster[0:3] == bytes((x * 7 + 3) % 256 for x in range(3))
    assert raster[3:6] == bytes((x * 7 + 3) % 256 for x in range(2 * 3, 3 * 3))
    # output row 1 maps to source row y*h//oh = 1*6//3 = 2, whose first
    # pixel starts at flat byte 2*8*3 = 48
    src_row2 = bytes(((48 + x) * 7 + 3) % 256 for x in range(3))
    assert raster[4 * 3 : 4 * 3 + 3] == src_row2
    # degenerate: factor larger than image clamps to 1x1
    w1, h1, _, _ = decode_ppm(resize_ppm(_make_ppm(3, 2), 16))
    assert (w1, h1) == (1, 1)


def test_resize_media_real_kernel_in_spark(spark):
    from wolf_quake_spark.analysis.multimodal import decode_ppm, resize_media

    ppm = _make_ppm(10, 4, comment=False)
    rows = [(7, "image/ppm", bytearray(ppm), len(ppm), "x")]
    media = spark.createDataFrame(
        rows,
        "doc_id long, media_type string, payload binary, byte_len long, payload_sha string",
    )
    got = resize_media(media, factor=2, fake=False).collect()[0]
    assert (got["in_width"], got["in_height"]) == (10, 4)
    assert (got["out_width"], got["out_height"]) == (5, 2)
    w, h, _, _ = decode_ppm(bytes(got["out_payload"]))
    assert (w, h) == (5, 2)
    assert got["out_byte_len"] == len(got["out_payload"])


def test_frame_sample_slices_and_checksums(spark):
    import hashlib

    from wolf_quake_spark.analysis.multimodal import frame_sample, to_media

    text = "".join(chr(97 + i % 26) for i in range(100))  # 100 ascii bytes
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        frame_sample(to_media(docs), frame_bytes=32, every_k=2).collect(),
        key=lambda r: r["frame_idx"],
    )
    # 100 bytes / 32 = 4 frames (last ragged), sampled 0 and 2
    assert [(r["frame_idx"], r["frame_off"], r["frame_len"]) for r in rows] == [
        (0, 0, 32),
        (2, 64, 32),
    ]
    for r in rows:
        expect = hashlib.sha256(
            text.encode()[r["frame_off"] : r["frame_off"] + 32]
        ).hexdigest()
        assert r["frame_sha"] == expect
    # ragged tail frame: sample every frame, check the short one
    all_rows = sorted(
        frame_sample(to_media(docs), frame_bytes=32, every_k=1).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_len"] for r in all_rows] == [32, 32, 32, 4]


def test_vertical_tab_splits_words(spark):
    # WS_SPLIT must treat \x0b as a word boundary on BOTH engines; the Spark
    # side is checked here, the shared explicit class keeps DuckDB identical
    df = spark.createDataFrame([(1, "foo\x0bbar baz")], "doc_id long, text string")
    assert df.select(token_count(F.col("text")).alias("n")).first()["n"] == 3
    sh = {r["shingle"] for r in word_shingles(df, n=2).collect()}
    assert sh == {"foo bar", "bar baz"}


def test_quantize_int8_roundtrip(spark):
    from wolf_quake_spark.analysis.similarity import quantize_int8

    emb = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {(r["vec_id"], r["dim"]): r for r in quantize_int8(emb).collect()}
    # amax=1.0 → q8 = round(x*127)
    assert rows[(1, 1)]["q8"] == 64 and rows[(1, 2)]["q8"] == -127
    assert rows[(1, 3)]["q8"] == 32  # 31.75 rounds half-up to 32
    assert rows[(1, 1)]["amax_x1000"] == 1000
    # all-zero vector: q8 = 0, scale 0 (no div-by-zero)
    assert all(rows[(2, d)]["q8"] == 0 for d in (1, 2, 3))
    # dequantization error bounded by amax/254 per element
    x, q, amax = 0.5, rows[(1, 1)]["q8"], rows[(1, 1)]["amax_x1000"] / 1000
    assert abs(q / 127 * amax - x) <= amax / 254


def test_kmeans_assign_converges_to_seeds(vecs):
    from wolf_quake_spark.analysis.similarity import kmeans_assign

    # k=2 seeded with vec 0 (=[1,0,0,0]) and vec 1 (identical): vectors 0,1,2
    # sit at/near seed 0's position; the opposite vector 3 and zero vector 4
    # are strictly closer to whichever centroid drifts toward them
    got = {r["vec_id"]: r["cent_id"] for r in kmeans_assign(vecs, k=2, iters=2).collect()}
    assert got[0] == got[1] == got[2]  # the identical/near cluster stays together
    assert set(got) == {0, 1, 2, 3, 4}
    # deterministic: same input → same assignment
    again = {r["vec_id"]: r["cent_id"] for r in kmeans_assign(vecs, k=2, iters=2).collect()}
    assert got == again


def test_kmeans_two_level_refines_and_bounds(spark):
    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.similarity import (
        derived_coarse_k,
        kmeans_assign,
        kmeans_assign_two_level,
    )

    # three well-separated lobes, each with an exact-duplicate pair, big
    # enough that per-cell k2 = round(sqrt(n_cell)) > 1 actually splits cells
    rows = []
    for lobe, center in enumerate(([10.0, 0.0], [0.0, 10.0], [-10.0, -10.0])):
        for j in range(20):
            off = (j % 5) * 0.01
            rows.append((lobe * 100 + j, [center[0] + off, center[1] - off]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    out = kmeans_assign_two_level(vecs).cache()
    got = {r["vec_id"]: (r["cell_id"], r["sub_id"]) for r in out.collect()}
    assert len(got) == len(rows)  # every vector assigned exactly once

    # level 1 is exactly the flat quantizer at the coarse k — the hierarchy
    # refines it, never re-partitions it
    coarse = {
        r["vec_id"]: r["cent_id"]
        for r in kmeans_assign(vecs, k=derived_coarse_k(len(rows))).collect()
    }
    assert {v: c for v, (c, _) in got.items()} == coarse

    # identical vectors land in the same leaf (offset j%5 repeats 4x/lobe)
    for base in (0, 100, 200):
        assert got[base] == got[base + 5]

    # per-cell sub_id count respects the recursive sqrt rule
    sizes = out.groupBy("cell_id").agg(
        F.countDistinct("sub_id").alias("subs"), F.count("*").alias("n")
    )
    for r in sizes.collect():
        assert r["subs"] <= max(1, round(r["n"] ** 0.5))

    # deterministic
    again = {
        r["vec_id"]: (r["cell_id"], r["sub_id"])
        for r in kmeans_assign_two_level(vecs).collect()
    }
    assert got == again
    out.unpersist()


def test_kmeans_search_and_probe_curve(spark):
    """Semantic-cell IVF search: probing ALL cells equals brute force
    (recall 1.0), recall is monotone in the probe budget, and the search
    output is a subset of the probed cells' members."""
    import random

    from wolf_quake_spark.analysis.similarity import (
        kmeans_probe_curve,
        kmeans_search,
    )

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(120)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = rows[0][1]

    curve = {r["n_probes"]: r["recall_at_10"]
             for r in kmeans_probe_curve(vecs, qv, k=10, probes=(1, 3, 999)).collect()}
    assert curve[999] == 1.0          # probing every cell IS brute force
    assert curve[1] <= curve[3] <= curve[999]  # monotone in budget

    got = kmeans_search(vecs, qv, k=5, n_probes=999).collect()
    assert len(got) == 5 and got[0]["vec_id"] == 0  # query matches itself


def test_srp_signatures_and_pairs(vecs):
    from wolf_quake_spark.analysis.similarity import (
        srp_hyperplanes,
        srp_neardup_pairs,
        srp_signatures,
    )

    # deterministic hyperplanes: stable across calls, bounded coefficients
    p1, p2 = srp_hyperplanes(4), srp_hyperplanes(4)
    assert p1 == p2 and all(-32768 <= c <= 32767 for row in p1 for c in row)

    sig = {r["vec_id"]: r["srp_sig"] for r in srp_signatures(vecs, dim=4).collect()}
    assert sig[0] == sig[1]  # identical vectors → identical signature
    assert all(0 <= s < (1 << 16) for s in sig.values())
    # opposite vector flips every non-zero-dot bit → large Hamming distance
    assert bin(sig[0] ^ sig[3]).count("1") > 8

    pairs = {(r["vec_a"], r["vec_b"]): r["cosine"]
             for r in srp_neardup_pairs(vecs, dim=4, top=10).collect()}
    assert pairs[(0, 1)] == 1.0  # identical vectors always share every band
    # every reported cosine must equal the brute-force value
    brute = {r["vec_id"]: r["cosine"]
             for r in cosine_scores(vecs, [1.0, 0.0, 0.0, 0.0]).collect()}
    if (0, 2) in pairs:
        assert abs(pairs[(0, 2)] - brute[2]) < 1e-12


def test_ivf_search_multiprobe_superset(vecs):
    # the probe set covers the query's Hamming-1 neighborhood, so for this
    # tiny corpus (2 buckets) multi-probe scans everything → exact top-k
    got = [r["vec_id"] for r in ivf_search(vecs, [1.0, 0.0, 0.0, 0.0], k=3).collect()]
    want = [r["vec_id"] for r in topk(vecs, [1.0, 0.0, 0.0, 0.0], k=3).collect()]
    assert got == want
    # single-probe scans only the query's own bucket
    single = ivf_search(vecs, [1.0, 0.0, 0.0, 0.0], k=10, multi_probe=False).collect()
    assert {r["vec_id"] for r in single} == {0, 1, 2, 4}  # vec 3 is in the other bucket


def test_countmin_never_underestimates(spark):
    """CM guarantee: estimate ≥ exact for EVERY term (not just the top-20),
    collisions make some strictly positive at narrow width, and a
    hand-planted mega-term is estimated exactly when it dominates its
    cells."""
    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.textstats import countmin_term_counts

    rows = [(i, f"w{i % 97} w{(i * 7) % 97} common common") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # audit the FULL vocabulary, not just top-20
    got = countmin_term_counts(docs, width=32, k=10_000).collect()
    assert len(got) == 98  # 97 wN terms + 'common'
    assert all(r["overestimate"] >= 0 for r in got)
    assert any(r["overestimate"] > 0 for r in got)  # 98 terms in 32-wide rows
    top = max(got, key=lambda r: r["exact_count"])
    assert top["term"] == "common" and top["exact_count"] == 600


def test_bm25_hand_computed(spark):
    """BM25 on a 3-doc fixture matches a by-hand Robertson computation to
    the 6-decimal quantum, and non-matching docs are absent."""
    import math

    from wolf_quake_spark.analysis.textstats import bm25_scores

    rows = [
        (0, "cat sat on the mat"),        # 'cat' x1, dl=5
        (1, "cat cat dog"),               # 'cat' x2 'dog' x1, dl=3
        (2, "nothing relevant here at all six"),  # dl=6 — no match
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bm25_scores(docs, ["cat", "dog"]).collect()}
    assert set(got) == {0, 1}
    n, avgdl, k1, b = 3, 14 / 3, 1.2, 0.75

    def score(pairs, dl):
        s = 0.0
        for tf, df in pairs:
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        return round(s, 6)

    assert got[0]["bm25"] == score([(1, 2)], 5)           # cat: df=2
    assert got[1]["bm25"] == score([(2, 2), (1, 1)], 3)   # cat df=2, dog df=1
    assert got[1]["n_matched_terms"] == 2


def test_dsir_scores_tilt_toward_target(spark):
    """Docs made of target-only vocabulary score positive (selected), docs
    of off-target vocabulary score negative, and scores are deterministic."""
    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.sampling import dsir_scores

    # docs must be long enough that the add-one smoothing over 1024 hashed
    # buckets doesn't wash out the model difference (real docs are)
    en_text = ("alpha beta gamma delta " * 25).strip()
    es_text = ("uno dos tres cuatro " * 25).strip()
    rows = []
    for i in range(20):
        rows.append((i, en_text, "en"))                        # target style
    for i in range(20, 40):
        rows.append((i, es_text, "es"))                        # raw-only style
    rows.append((100, ("alpha beta " * 50).strip(), "es"))     # en-style text, es label
    rows.append((101, ("uno dos " * 50).strip(), "en"))        # es-style text, en label
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    out = {r["doc_id"]: r for r in
           dsir_scores(docs, target=F.col("lang") == "en").collect()}
    assert len(out) == 42
    # vocabulary that dominates the target slice scores high even when the
    # doc itself is labeled off-target — DSIR scores the TEXT, not the label
    assert out[100]["dsir_logratio"] > out[20]["dsir_logratio"]
    assert out[100]["dsir_logratio"] > out[101]["dsir_logratio"]
    assert out[101]["dsir_logratio"] < out[0]["dsir_logratio"]
    assert out[20]["dsir_logratio"] < out[0]["dsir_logratio"]
    # top-20% selection: ceil(0.2*42) = 9 docs; the 20 identical en docs tie
    # at the top and the doc_id tie-break picks the first nine of them
    assert {d for d, r in out.items() if r["selected"]} == set(range(9))
    assert out[100]["n_tokens"] == 100

    again = {r["doc_id"]: r["dsir_logratio"] for r in
             dsir_scores(docs, target=F.col("lang") == "en").collect()}
    assert again == {k: v["dsir_logratio"] for k, v in out.items()}


def test_weighted_sample_proportional_and_deterministic(spark):
    """A-ES sampling: exactly k rows, reproducible, and weight-proportional
    (100×-heavier docs dominate the sample of a 50/50 corpus)."""
    from wolf_quake_spark.analysis.sampling import weighted_sample

    rows = [(i, 100 if i < 100 else 1) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = weighted_sample(docs, k=50).collect()
    assert len(got) == 50
    heavy = sum(1 for r in got if r["doc_id"] < 100)
    assert heavy >= 45  # weight ∝ 100:1 ⇒ light docs are rare in the sample
    again = weighted_sample(docs, k=50).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_source_quota_cap(spark):
    """Per-domain cap keeps ≤ quota rows per source, is deterministic, and
    subsamples rather than truncating by doc_id."""
    from wolf_quake_spark.analysis.sampling import source_quota_cap

    rows = [(i, f"src{i % 3}") for i in range(90)] + [(1000, "rare")]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = source_quota_cap(docs, quota=5).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) <= 5 for v in by_src.values())
    assert len(by_src["src0"]) == 5 and by_src["rare"] == [1000]
    # md5 shuffle, not first-N: src0 members are NOT simply 0,3,6,9,12
    assert sorted(by_src["src0"]) != [0, 3, 6, 9, 12]
    again = source_quota_cap(docs, quota=5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello, world! x2"), (2, ""), (3, "  spaced   out  ")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["ws"], r["bpe"])
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("ws"),
            bpe_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert out[1] == (3, 6)  # [hello][,][world][!][x][2]
    assert out[2] == (0, 0)
    assert out[3] == (2, 2)


def test_stratified_sample_deterministic(spark):
    from wolf_quake_spark.analysis.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, "x", "en" if i % 2 else "zh") for i in range(400)],
        "doc_id long, text string, lang string",
    )
    kept1 = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.25, "zh": 1.0}).collect()}
    # identical under a different partitioning — no partition-order dependence
    kept2 = {
        r["doc_id"]
        for r in stratified_sample(docs.repartition(7), {"en": 0.25, "zh": 1.0}).collect()
    }
    assert kept1 == kept2
    zh = {i for i in range(400) if i % 2 == 0}
    assert zh <= kept1  # rate 1.0 keeps every zh doc
    en_kept = len(kept1 - zh)
    assert 20 <= en_kept <= 80  # ~25% of 200, hash-spread


def test_decode_wav_real_chunk_walk():
    from wolf_quake_spark.analysis.multimodal import decode_wav, synth_wav

    rate, ch, bits, n, ms, bins = decode_wav(synth_wav(b"abcdefghij"))
    assert (rate, ch, bits, n, ms) == (8000, 1, 8, 10, 1)
    assert bins[:2] == [ord("a"), ord("b")]  # binsz=1 → one byte per bin
    # unknown chunk before fmt/data, odd size → word-aligned skip
    wav = synth_wav(b"hello")
    with_list = wav[:12] + b"LIST" + (3).to_bytes(4, "little") + b"xy z" + wav[12:]
    assert decode_wav(with_list)[3] == 5
    import pytest as _pt

    for bad in (b"", b"RIFX0000WAVE", synth_wav(b"x")[:20]):
        with _pt.raises(ValueError):
            decode_wav(bad)


def test_wav_features_in_spark(spark):
    from wolf_quake_spark.analysis.multimodal import to_media, wav_features

    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in wav_features(to_media(docs)).collect()}
    assert out[1]["n_samples"] == 8 and out[1]["bin0"] == ord("a")
    assert out[2]["n_samples"] == 0 and out[2]["bin7"] == 0


def test_remove_boilerplate(spark):
    from wolf_quake_spark.analysis.boilerplate import remove_boilerplate

    banner = "copyright acme corp"  # exactly one 3-word segment
    rows = [(i, banner + f" unique{i} body{i} text{i} alpha{i}") for i in range(5)]
    rows.append((99, "entirely fresh document body"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in remove_boilerplate(docs, min_docs=5).collect()}
    # the banner segment appears in 5 docs → removed from each
    r0 = out[0]
    assert r0["n_segments"] == 3 and r0["n_removed"] == 1
    assert r0["clean_text"] == "unique0 body0 text0 alpha0"
    # the unique doc is untouched
    assert out[99]["n_removed"] == 0
    assert out[99]["clean_text"] == "entirely fresh document body"
    # below threshold nothing is removed
    out4 = {r["doc_id"]: r["n_removed"] for r in remove_boilerplate(docs, min_docs=6).collect()}
    assert all(v == 0 for v in out4.values())


def test_redact_pii(spark):
    from wolf_quake_spark.analysis.scrub import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.io and c.d+e@ex.org, server 192.168.1.1 tel 555-123-4567"),
            (2, "no pii here"),
            (3, "+123 456 7890 and 10.0.0.255"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in redact_pii(df).collect()}
    r1 = out[1]
    assert (r1["n_emails"], r1["n_ips"], r1["n_phones"]) == (2, 1, 1)
    assert r1["redacted"] == "mail <EMAIL> and <EMAIL>, server <IP> tel <PHONE>"
    r2 = out[2]
    assert (r2["n_emails"], r2["n_ips"], r2["n_phones"]) == (0, 0, 0)
    assert r2["redacted"] == "no pii here"
    r3 = out[3]
    assert (r3["n_phones"], r3["n_ips"]) == (1, 1)
    assert r3["redacted"] == "<PHONE> and <IP>"


def test_contamination_report(spark):
    from wolf_quake_spark.analysis.contamination import (
        contamination_report,
        split_bucket,
    )
    from pyspark.sql import functions as F

    # find doc_ids that land in train (<800) and test (>=900) buckets
    probe = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    ).select("doc_id", split_bucket(F.col("doc_id")).alias("b")).collect()
    train_ids = [r["doc_id"] for r in probe if r["b"] < 800]
    test_ids = [r["doc_id"] for r in probe if r["b"] >= 900]
    assert train_ids and test_ids
    leak = "the secret benchmark answer is forty two exactly"
    rows = [
        (train_ids[0], "prefix words " + leak + " suffix words"),  # contaminated
        (train_ids[1], "completely unrelated training text about spark"),
        (test_ids[0], leak),  # the benchmark doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_contaminated_ngrams"]
        for r in contamination_report(docs, n=5).collect()
    }
    # leak has 8 words → 4 shared 5-grams; clean doc absent
    assert got == {train_ids[0]: 4}


def test_training_order_deterministic_permutation(spark):
    """Positions are a 1..N permutation, identical regardless of input
    partitioning (the whole point vs rand()), and reseeding permutes."""
    from wolf_quake_spark.analysis.sampling import training_order

    docs = spark.range(97).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["position"] for r in training_order(docs).collect()}
    b = {r["doc_id"]: r["position"]
         for r in training_order(docs.repartition(7)).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, 98))
    c = {r["doc_id"]: r["position"]
         for r in training_order(docs, seed="epoch-1").collect()}
    assert sorted(c.values()) == list(range(1, 98))
    assert c != a


def test_bigram_logprob_scores(spark):
    from wolf_quake_spark.analysis.textstats import bigram_logprob_scores
    import math

    rows = [
        (1, "a b a b"),   # P(b|a)=2/2, P(a|b)=1/1 → nll 0 over 3 bigrams
        (2, "a c"),       # P(c|a)=1/3 (context a: 2× a→b from doc 1 + this)
        (3, "x"),         # <2 tokens → no bigrams → absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_bigrams"], r["mean_nll"])
           for r in bigram_logprob_scores(docs).collect()}
    assert set(out) == {1, 2}
    # doc 1: 2·(-ln(2/3)) + 1·(-ln 1) over 3 bigrams
    assert out[1] == (3, round(2 * -math.log(2 / 3) / 3, 6))
    assert out[2] == (1, round(-math.log(1 / 3), 6))


def test_kneser_ney_bigram_scores(spark):
    from wolf_quake_spark.analysis.textstats import (
        _doc_bigram_freqs,
        kneser_ney_bigram_scores,
    )
    import math

    rows = [
        (1, "a b a b"),
        (2, "a c"),
        (3, "x"),  # <2 tokens → no bigrams → absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_bigrams"], r["mean_nll_kn"])
           for r in kneser_ney_bigram_scores(docs).collect()}
    assert set(out) == {1, 2}
    # model: c(a,b)=2 c(b,a)=1 c(a,c)=1; c(a·)=3 c(b·)=1; N1+(a·)=2 N1+(b·)=1
    # N1+(·b)=1 N1+(·a)=1 N1+(·c)=1; |types|=3; D=0.75
    def pkn(c12, c1, n1f, n1p):
        return max(c12 - 0.75, 0.0) / c1 + (0.75 * n1f / c1) * (n1p / 3.0)

    p_ab = pkn(2, 3, 2, 1)
    p_ba = pkn(1, 1, 1, 1)
    p_ac = pkn(1, 3, 2, 1)
    assert out[1] == (3, round(-(2 * math.log(p_ab) + math.log(p_ba)) / 3, 6))
    assert out[2] == (1, round(-math.log(p_ac), 6))
    # smoothing invariant: observed-follower mass per context < 1 (mass is
    # reserved for unseen continuations), and every probability is positive
    assert 0 < p_ab + p_ac < 1  # context 'a': 2 observed followers
    assert 0 < p_ba < 1  # context 'b': 1 observed follower

    # corpus-level invariant on real data: every score positive and finite
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = kneser_ney_bigram_scores(real)
    bad = scored.filter(
        (F.col("mean_nll_kn") <= 0) | F.isnan("mean_nll_kn")
    ).count()
    assert bad == 0
    # doc coverage: exactly the docs with ≥1 bigram are scored
    assert scored.count() == _doc_bigram_freqs(real, "text").select(
        "doc_id"
    ).distinct().count()


def test_bloom_contamination_matches_exact(spark):
    """Bloom prefilter + exact verify must equal the exact join (no false
    negatives by Bloom construction; FPs removed by the verify join) — even
    with a deliberately tiny, collision-heavy bitset."""
    from wolf_quake_spark.analysis.contamination import (
        bloom_contamination_report,
        contamination_report,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = sorted(contamination_report(docs, n=5).collect())
    # bits_per_item=1 forces a saturated bitset: every FP must be verified away
    for bpi in (1, 16):
        got = sorted(bloom_contamination_report(docs, n=5, bits_per_item=bpi).collect())
        assert got == exact, f"bits_per_item={bpi}"


def test_tfidf_top_terms(spark):
    from wolf_quake_spark.analysis.textstats import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "apple cherry"),
            (3, "durian"),
            (4, ""),  # no tokens → no rows
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["tfidf"])
        for r in tfidf_top_terms(df, k=2).collect()
    }
    import math

    # doc 1: apple tf=2 beats banana tf=1; apple df=2, banana df=1
    assert rows[(1, 1)][:3] == ("apple", 2, 2)
    assert rows[(1, 2)][:3] == ("banana", 1, 1)
    assert rows[(1, 1)][3] == pytest.approx(2 * math.log(4 / 2))
    assert rows[(1, 2)][3] == pytest.approx(1 * math.log(4 / 1))
    # doc 2 ties on tf=1 → rarer term (cherry df=1) outranks apple df=2
    assert rows[(2, 1)][0] == "cherry" and rows[(2, 2)][0] == "apple"
    assert (4, 1) not in rows  # empty doc emits nothing


def test_unigram_logprob_scores(spark):
    import math

    from wolf_quake_spark.analysis.textstats import unigram_logprob_scores

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    # corpus counts: a=3 b=2 c=1, total=6
    out = {r["doc_id"]: r.asDict() for r in unigram_logprob_scores(df).collect()}
    assert out[1]["n_tokens"] == 3
    exp1 = -(2 * math.log(3 / 6) + math.log(2 / 6)) / 3
    assert out[1]["mean_nll"] == pytest.approx(exp1, abs=1e-6)
    assert out[3]["mean_nll"] == pytest.approx(-math.log(1 / 6), abs=1e-6)
    # the rarer-token doc is more surprising than the common-token doc
    assert out[3]["mean_nll"] > out[1]["mean_nll"]


def test_repetition_signals(spark):
    from wolf_quake_spark.analysis.textstats import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam eggs"),
            (2, "one"),  # single token → no bigram
            (3, "a b a b"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}
    r1 = out[1]
    assert (r1["n_tokens"], r1["n_distinct_tokens"]) == (4, 2)
    assert (r1["top_token"], r1["top_token_tf"]) == ("spam", 3)
    assert (r1["top_bigram"], r1["top_bigram_tf"]) == ("spam spam", 2)
    assert r1["dup_token_frac"] == pytest.approx(0.5)
    r2 = out[2]
    assert (r2["n_tokens"], r2["top_bigram"], r2["top_bigram_tf"]) == (1, None, None)
    assert r2["dup_token_frac"] == 0.0
    # doc 3: 'a b' occurs twice, beats 'b a' (once); token tie a/b → 'a' wins
    r3 = out[3]
    assert (r3["top_token"], r3["top_token_tf"]) == ("a", 2)
    assert (r3["top_bigram"], r3["top_bigram_tf"]) == ("a b", 2)


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of war"),
            (2, "der hund und die katze"),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "und"


def test_lang_id_ngram(spark):
    from wolf_quake_spark.analysis.textstats import lang_id_ngram, substring_count

    df = spark.createDataFrame(
        [
            (1, "the weather is otherworldly"),  # 'the' fires mid-token too
            (2, "der wunderbare hund und die katze"),
            (3, "el gato los perros y "),
            (4, "qqq zzz"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in df.select(
            "doc_id", lang_id_ngram(F.col("text")).alias("lang")
        ).collect()
    }
    assert got == {1: "en", 2: "de", 3: "es", 4: "und"}
    # substring_count is raw (mid-token) and non-overlapping
    one = spark.createDataFrame([("ababab",)], "text string")
    assert one.select(substring_count(F.col("text"), "ab").alias("n")).first()["n"] == 3
    assert one.select(substring_count(F.col("text"), "aba").alias("n")).first()["n"] == 1


# ---------------------------------------------------------------------------
# Winnowing fingerprints (analysis/dedup.py:winnow_fingerprints)
# ---------------------------------------------------------------------------

def _ref_winnow(text: str, k: int = 8, w: int = 4) -> set[str]:
    """Independent pure-Python winnowing (Schleimer et al. 2003) reference."""
    import hashlib
    import re

    norm = re.sub(r"[ \t\n\x0b\f\r]+", " ", text).strip(" ").lower()
    hs = [
        hashlib.md5(norm[i : i + k].encode()).hexdigest()[:8]
        for i in range(len(norm) - k + 1)
    ]
    if not hs:
        return set()
    n_windows = max(len(hs) - w + 1, 1)
    return {min(hs[j : j + w]) for j in range(n_windows)}


def test_winnow_matches_python_reference(docs):
    from wolf_quake_spark.analysis.dedup import winnow_fingerprints

    got: dict[int, set[str]] = {}
    for r in winnow_fingerprints(docs).collect():
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, text in rows.items():
        assert got.get(doc_id, set()) == _ref_winnow(text), doc_id
    # empty + sub-k docs produce nothing; "short" is 5 chars < k=8
    assert 5 not in got and 6 not in got


def test_winnow_shared_substring_guarantee(docs):
    from wolf_quake_spark.analysis.dedup import winnow_fingerprints

    fps: dict[int, set[str]] = {}
    for r in winnow_fingerprints(docs).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    # exact dups fingerprint identically
    assert fps[1] == fps[2] and fps[1]
    # docs 1 and 3 share a 40-char prefix >= w + k - 1 = 11 → must share >= 1
    assert fps[1] & fps[3]
    # unrelated content shares nothing here
    assert not (fps[1] & fps[4])


def test_winnow_single_window_short_doc(spark):
    from wolf_quake_spark.analysis.dedup import winnow_fingerprints

    # 10 chars → 3 k-grams (k=8) < w=4 → exactly one clamped-window min
    one = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    rows = winnow_fingerprints(one).collect()
    assert len(rows) == 1
    assert {rows[0]["fingerprint"]} == _ref_winnow("abcdefghij")


def test_winnow_neardup_pairs(docs):
    from wolf_quake_spark.analysis.dedup import winnow_neardup_pairs

    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_fps"]
        for r in winnow_neardup_pairs(docs).collect()
    }
    assert (1, 2) in pairs  # exact dups share everything
    assert (1, 3) in pairs or pairs.get((1, 2), 0) >= 2
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_label_propagate_transitive_chain(spark):
    # Chain 1-2-3 plus a separate pair 6-7 and singletons 4, 5: the closure
    # must label {1,2,3}→1 (transitively — no direct 1-3 edge), {6,7}→6,
    # and keep singletons as their own canonical rows.
    from wolf_quake_spark.analysis.dedup import label_propagate

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (7, 6)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: (r["component_id"], r["is_canonical"])
           for r in label_propagate(nodes, pairs).collect()}
    assert out == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (5, True), 6: (6, True), 7: (6, False),
    }


def test_dedup_components_exact_dups_cluster(spark):
    # Byte-identical docs have identical minhash signatures, so every LSH
    # band matches deterministically and jaccard = 1.0: 1+2 must cluster.
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely different content about spark engines at scale"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from wolf_quake_spark.analysis.dedup import dedup_components

    out = {r["doc_id"]: (r["component_id"], r["is_canonical"])
           for r in dedup_components(docs, threshold=0.5).collect()}
    assert out == {1: (1, True), 2: (1, False), 3: (3, True)}


def test_dedup_apply_survivors(spark):
    # same fixture as the components test plus n_chars: docs 1+2 cluster
    # (keeper 1, doc 2's chars removed); doc 3 is a singleton survivor.
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight", 52),
        (2, "the quick brown fox jumps over the lazy dog tonight", 52),
        (3, "completely different content about spark engines at scale", 58),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    from wolf_quake_spark.analysis.dedup import dedup_apply

    out = {r["doc_id"]: (r["n_members"], r["chars_removed"])
           for r in dedup_apply(docs, threshold=0.5).collect()}
    assert out == {1: (2, 52), 3: (1, 0)}
    # invariant: members across survivors account for every input doc
    assert sum(m for m, _ in out.values()) == len(rows)


def test_events_asof_window(spark):
    # click before any purchase → NULL; after → value of latest prior
    # purchase; same-user ordering by (ts, event_id).
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        (1, t(1), 10, "click", 0.0),
        (2, t(2), 10, "purchase", 5.0),
        (3, t(3), 10, "click", 0.0),
        (4, t(4), 10, "purchase", 7.0),
        (5, t(5), 10, "click", 0.0),
        (6, t(1), 20, "click", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    # the registered query shape, inlined on the in-memory frame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pv = F.when(F.col("event_type") == "purchase", F.col("value"))
    got = {
        r["event_id"]: r["purchase_value_asof"]
        for r in ev.withColumn(
            "purchase_value_asof", F.last(pv, ignorenulls=True).over(w)
        )
        .filter(F.col("event_type") == "click")
        .collect()
    }
    assert got == {1: None, 3: 5.0, 5: 7.0, 6: None}


def test_salted_topk_matches_naive_window(spark, tmp_path):
    # The two-stage salted group-wise top-k must equal the naive
    # single-window-per-group formulation exactly.
    import random

    rng = random.Random(7)
    rows = [(i, rng.choice("abc"), rng.randrange(10), rng.randrange(1000))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, quality_score long, n_chars long")
    sf_dir = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    from pyspark.sql import Window

    order = [F.desc("quality_score"), F.desc("n_chars"), F.asc("doc_id")]
    naive = (
        df.withColumn("rk", F.row_number().over(Window.partitionBy("lang").orderBy(*order)).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("lang", "rk", "doc_id")
    )
    salt = (F.col("doc_id") % F.lit(64)).alias("salt")
    partial = (
        df.withColumn("salt", salt)
        .withColumn("srk", F.row_number().over(Window.partitionBy("lang", "salt").orderBy(*order)))
        .filter(F.col("srk") <= 5)
    )
    staged = (
        partial.withColumn("rk", F.row_number().over(Window.partitionBy("lang").orderBy(*order)).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("lang", "rk", "doc_id")
    )
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, staged.collect()))


def test_filter_chain(spark):
    from wolf_quake_spark.analysis.filters import filter_chain

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house sat"),  # passes everything
            (2, "the and"),  # too short
            (3, "the quick brown fox { jumped } over and of it all"),  # brace
            (4, "a b c d e f g h i j"),  # 1-char tokens -> word_len fail
            (5, "und und und und und und"),  # no en/de/es/fr stopword? 'und' IS de
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in filter_chain(df).collect()}
    assert out[1]["keep"] == 1 and all(v == 1 for k, v in out[1].items() if k != "doc_id")
    assert out[2]["f_min_tokens"] == 0 and out[2]["keep"] == 0
    assert out[3]["f_brace"] == 0 and out[3]["keep"] == 0
    assert out[4]["f_word_len"] == 0 and out[4]["keep"] == 0
    # 'und' is a German stopword: stopword rule passes, word_len (3.0) passes
    assert out[5]["f_stopword"] == 1


def test_pack_manifest(spark):
    from wolf_quake_spark.analysis.filters import pack_manifest

    df = spark.createDataFrame(
        [(i, " ".join(["tok"] * (3 + i))) for i in range(1, 7)] + [(99, "   ")],
        "doc_id long, text string",
    )
    out = pack_manifest(df, budget=5, n_shards=2).collect()
    # zero-token doc dropped
    assert {r["doc_id"] for r in out} == set(range(1, 7))
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["tok_offset"])
        # offsets are a contiguous concat layout within the shard
        pos = 0
        for r in rows:
            assert r["tok_offset"] == pos
            assert r["start_bin"] == pos // 5
            assert r["end_bin"] == (pos + r["n_tokens"] - 1) // 5
            assert r["n_bins"] == r["end_bin"] - r["start_bin"] + 1
            pos += r["n_tokens"]


def test_doc_chunks(spark):
    from wolf_quake_spark.analysis.filters import doc_chunks

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, ""), (3, None), (4, "xy")],
        "doc_id long, text string",
    )
    out = doc_chunks(df, size=4, stride=3).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["start"], r["chunk_text"]) for r in out}
    # doc 1: starts 0,3,6,9 -> abcd, defg, ghij, j
    assert got[(1, 0)] == (0, "abcd")
    assert got[(1, 1)] == (3, "defg")
    assert got[(1, 2)] == (6, "ghij")
    assert got[(1, 3)] == (9, "j")
    assert (2, 0) not in got and (3, 0) not in got
    assert got[(4, 0)] == (0, "xy")
    assert all(r["chunk_len"] == len(r["chunk_text"]) for r in out)


def test_dup_ngram_spans(spark):
    from wolf_quake_spark.analysis.dedup import dup_ngram_spans

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # grams: "a b c","b c d","c d e","d e f"
            (2, "a b c x y"),        # grams: "a b c","b c x","c x y"
            (3, "z z z z"),          # grams: "z z z" x2 (intra-doc dup)
            (4, "p q"),              # too short for n=3 -> absent
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in dup_ngram_spans(df, n=3).collect()}
    assert out[1]["n_grams"] == 4 and out[1]["dup_ngrams"] == 1  # "a b c"
    assert out[2]["n_grams"] == 3 and out[2]["dup_ngrams"] == 1
    assert out[3]["n_grams"] == 2 and out[3]["dup_ngrams"] == 2  # intra-doc
    assert out[3]["dup_frac"] == 1.0
    assert 4 not in out
    getattr(dup_ngram_spans(df, n=3), "_wqs_persisted").unpersist()


def test_run_curation_end_to_end(spark, tmp_path):
    """Materialized curation run: funnel is monotone per language, the
    manifest is consistent with the written survivors table, and survivors
    satisfy every signal cut."""
    from wolf_quake_spark.plans.curate import run_curation

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "curated")
    manifest = run_curation(spark, docs, out)

    for lang, stages in manifest["per_lang"].items():
        assert stages == sorted(stages, reverse=True), (lang, stages)
        assert stages[0] > 0
    # cap observability lands in the manifest next to the stage counts:
    # uncapped run → nonzero bucket census, zero dropped
    m = manifest["lsh_bucket_metrics"]
    assert m["buckets_total"] > 0
    assert m["buckets_dropped"] == 0 and m["postings_dropped"] == 0
    survivors = spark.read.parquet(f"{out}/survivors")
    n_final = sum(s[-1] for s in manifest["per_lang"].values())
    assert survivors.count() == n_final
    sig = spark.read.parquet(f"{out}/signals")
    assert sig.count() == docs.count()
    joined = survivors.join(sig, "doc_id")
    from pyspark.sql import functions as F
    bad = joined.filter(
        (F.col("q") * F.col("canon") * F.col("clean") * F.col("samp")) != 1
    ).count()
    assert bad == 0
    # lang-partitioned layout: a per-language read prunes partitions
    one_lang = spark.read.parquet(f"{out}/survivors").filter(F.col("lang") == "en")
    plan = one_lang._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert one_lang.count() == manifest["per_lang"]["en"][-1]


def test_read_documents_jsonl_and_csv_with_rejects(spark, tmp_path):
    from wolf_quake_spark.sources.documents import read_documents_with_rejects

    jl = tmp_path / "docs.jsonl"
    jl.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s", "n_chars": 11}\n'
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s", "n_chars": 7}\n'
        'this is not json at all\n'
        '{"doc_id": "NOT_A_NUMBER", "text": 5}\n'
    )
    valid, rejects = read_documents_with_rejects(spark, str(jl), fmt="jsonl")
    rows = {r["doc_id"]: r["lang"] for r in valid.collect()}
    assert rows == {1: "en", 2: "fr"}
    assert rejects.count() == 2  # both bad lines quarantined, neither crashes
    # cached raw frame is exposed for release (shared by both splits) and
    # actually leaves the cache when released
    from wolf_quake_spark.sources.documents import release

    assert valid._wqs_persisted is rejects._wqs_persisted
    assert valid._wqs_persisted.storageLevel.useMemory
    release(valid, rejects)
    assert not valid._wqs_persisted.storageLevel.useMemory

    cv = tmp_path / "docs.csv"
    cv.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello world,en,s,11\n"
        "oops,not,a,valid,row_number\n"
    )
    valid, rejects = read_documents_with_rejects(spark, str(cv), fmt="csv")
    assert [r["doc_id"] for r in valid.collect()] == [1]
    assert rejects.count() == 1
    release(valid)


def test_user_value_trend_kernel(spark):
    """Grouped-map OLS kernel: hand-computed slope on a tiny group, and the
    zero-variance degenerate group emits slope 0.0 (not NULL/NaN)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.trends import user_value_trend

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: y(cents) = 100, 200, 300 at hours 0, 1, 2 -> slope 100/h
        (1, base, 1.0),
        (1, base + dt.timedelta(hours=1), 2.0),
        (1, base + dt.timedelta(hours=2), 3.0),
        # user 2: all events in the same hour -> zero x-variance -> 0.0
        (2, base, 5.0),
        (2, base + dt.timedelta(minutes=30), 9.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r["user_id"]: (r["n_events"], r["slope_x100_per_hour"])
        for r in user_value_trend(df).collect()
    }
    assert got[1] == (3, 100.0)
    assert got[2] == (2, 0.0)


def test_decode_bmp_real_kernel():
    """BMP decode: round-trips the synth container, honors top-down height,
    per-row stride padding, and rejects truncation/compression."""
    import pytest

    from wolf_quake_spark.analysis.multimodal import decode_bmp, synth_bmp

    data = bytes(range(97)) * 2  # 194 bytes -> 5 rows of 48, padded
    w, h, bpp, td, npix, bins = decode_bmp(synth_bmp(data))
    assert (w, h, bpp, td) == (16, 5, 24, 0)
    assert npix == 5 * 48
    assert sum(bins) == sum(data[: (npix // 8) * 8])  # zero pad adds nothing

    # top-down variant: negative height in the header, same raster size
    buf = bytearray(synth_bmp(data))
    buf[22:26] = (-5).to_bytes(4, "little", signed=True)
    w2, h2, _, td2, npix2, _ = decode_bmp(bytes(buf))
    assert (w2, h2, td2, npix2) == (16, 5, 1, 240)

    # odd width forces stride alignment: 15*3=45 -> stride 48
    buf = bytearray(synth_bmp(data))
    buf[18:22] = (15).to_bytes(4, "little", signed=True)
    assert decode_bmp(bytes(buf))[4] == 240

    with pytest.raises(ValueError):
        decode_bmp(synth_bmp(data)[:-1])  # truncated raster
    comp = bytearray(synth_bmp(data))
    comp[30] = 1  # BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(comp))
    with pytest.raises(ValueError):
        decode_bmp(b"PNG\x00" + b"\x00" * 60)


def test_sketch_profile_accuracy(spark):
    """The sketch entry has no SQL oracle (algorithm-specific state); this
    gates its accuracy against exact answers instead: HLL distinct within
    2% relative error, approximate percentiles bracketed by the exact
    neighboring order statistics."""
    from pyspark.sql import functions as F

    from wolf_quake_spark.queries import queries

    sf = "/root/testdata/sf0.01"
    got = {
        r["lang"]: r for r in queries()["sketch_profile"](spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    exact = {
        r["lang"]: r
        for r in docs.groupBy("lang")
        .agg(
            F.countDistinct("text").alias("nd"),
            F.expr("percentile(length(text), array(0.45, 0.55, 0.85, 0.95))").alias("ps"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for lang, r in got.items():
        e = exact[lang]
        assert abs(r["approx_distinct_texts"] - e["nd"]) <= max(0.05 * e["nd"], 2), (
            lang,
            dict(r.asDict()),
            e["nd"],
        )
        lo45, hi55, lo85, hi95 = e["ps"]
        assert lo45 <= r["p50_len"] <= hi55, (lang, dict(r.asDict()), e["ps"])
        assert lo85 <= r["p90_len"] <= hi95, (lang, dict(r.asDict()), e["ps"])


def test_global_cumsum_matches_naive_window(spark):
    """Distributed prefix sum == the single-partition window answer, with
    ties broken by the unique tiebreak, across partition-count choices."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.sampling import global_cumsum

    rows = [(i, (i * 37) % 11) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r["id"]: r["cum"]
        for r in global_cumsum(df, "v", [F.asc("v"), F.asc("id")], "cum").collect()
    }
    w = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["id"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_scd2_null_transitions(spark):
    """SCD2 change detection is null-safe: NULL→value and value→NULL both
    open a new validity interval; consecutive NULLs collapse."""
    import datetime as dt

    from wolf_quake_spark.queries import queries

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, None, base, 1),
        (1, None, base + dt.timedelta(hours=1), 2),   # same (NULL) — collapse
        (1, "a", base + dt.timedelta(hours=2), 3),    # NULL -> a: change
        (1, None, base + dt.timedelta(hours=3), 4),   # a -> NULL: change
    ]
    df = spark.createDataFrame(rows, "user_id long, props string, ts timestamp, event_id long")
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(d + "/events.parquet")
    out = sorted(
        (r["valid_from"], r["props"], r["is_current"])
        for r in queries()["user_props_scd2"](spark, d).collect()
    )
    assert [(o[1], o[2]) for o in out] == [(None, 0), ("a", 0), (None, 1)]


def test_new_queries_tolerate_empty_events(spark, tmp_path):
    """Degenerate-input sweep: the event-stream queries must return clean
    empty/zero results on an empty events table, not throw — the behavior
    a pipeline needs when a partition or day has no data."""
    from wolf_quake_spark.queries import queries

    d = str(tmp_path)
    empty = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
    )
    empty.write.mode("overwrite").parquet(d + "/events.parquet")
    q = queries()
    expect_empty = [
        "events_moving_stats", "events_value_ranks", "purchase_window_clicks",
        "user_props_scd2", "event_transition_matrix", "user_favorite_event",
        "user_event_paths", "events_sliding_rollup", "events_daily_dense",
        "events_asof_stale_guard", "user_value_trend",
    ]
    for name in expect_empty:
        assert q[name](spark, d).count() == 0, name
    # constant-width aggregates return one all-zero/NULL row, not nothing
    row = q["dq_expectations"](spark, d).collect()[0]
    assert row["n_rows"] == 0 and row["dup_event_ids"] == 0
    f = q["timed_funnel_conversion"](spark, d).collect()[0]
    assert tuple(f) == (0, 0, 0)


def test_fuzzy_blocking_composite_and_salted(spark):
    """Composite (token, length-bucket) blocking is output-identical to
    single-token blocking (bucket width > max_edits ⇒ no qualifying pair
    crosses more than one bucket), each pair is emitted exactly once, and
    salting a boilerplate-dominated block bounds per-task group sizes while
    leaving the output row-identical."""
    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.dedup import fuzzy_key_pairs

    # one dominating boilerplate opener + organic variety
    rows = [(i, f"terms of service version {i % 7} rev {i}") for i in range(300)]
    rows += [(1000 + i, f"doc number {i} about topic {i * 31 % 17}") for i in range(50)]
    rows += [(2000, "terms of service version 1 rev 1x")]  # near-dup of id 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    base = fuzzy_key_pairs(docs)
    salted = fuzzy_key_pairs(docs, salt=8, hot_block_size=100)
    got = sorted(map(tuple, base.collect()))
    assert sorted(map(tuple, salted.collect())) == got  # row-identical
    assert len(got) == len({(a, b) for a, b, _ in got})  # exactly-once

    # reference: brute-force all-pairs within max_edits on the same prefix
    key = F.substring(
        F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, 32
    )
    k = docs.select("doc_id", key.alias("k"))
    brute = (
        k.alias("a")
        .crossJoin(k.alias("b"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein("a.k", "b.k").cast("long").alias("edits"),
        )
        .filter(F.col("edits") <= 5)
    )
    brute_keys = {(a, b) for a, b, _ in map(tuple, brute.collect())}
    got_keys = {(a, b) for a, b, _ in got}
    # blocking only prunes pairs that disagree on the first token or sit in
    # non-adjacent length buckets — every brute pair sharing the block key
    # must survive, including the hot-block near-dup
    assert got_keys <= brute_keys
    assert (1, 2000) in got_keys

    # skew bound: the hot block's A-side verify groups split ~8-fold
    def max_group(df_pairs_input_salt):
        key_cols = ["block", "lbj", "s"]
        return df_pairs_input_salt.groupBy(*key_cols).count().agg(
            F.max("count")
        ).collect()[0][0]

    def a_side(salt, hot):
        kk = F.substring(
            F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, 32
        )
        keyed = docs.select(
            "doc_id",
            kk.alias("k"),
            F.split(kk, " ")[0].alias("block"),
            F.floor(F.length(kk) / 8).alias("lbj"),
        )
        s = (F.col("doc_id") % salt) if hot else F.lit(0)
        return keyed.withColumn("s", s.cast("long"))

    unsalted_max = max_group(a_side(8, hot=False))
    salted_max = max_group(a_side(8, hot=True))
    assert salted_max * 4 <= unsalted_max  # ≥4× split of the hot group


def test_crossdup_only_crosses_the_boundary(spark):
    """Incremental dedup pairs NEW docs with CORPUS docs only: identical
    twins inside the corpus (or inside the batch) never pair, while a new
    doc duplicating a corpus doc always does."""
    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.dedup import crossdup_pairs

    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, dup), (1, dup),                      # corpus-internal exact twins
        (2, "totally unrelated corpus text about other things entirely"),
        (10, dup),                               # new doc duplicating corpus
        (11, dup),                               # second new dup (new×new must not pair)
        (12, "fresh unseen content with no duplicate partner anywhere here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = crossdup_pairs(docs, is_new=F.col("doc_id") >= 10).collect()
    pairs = {(r["doc_new"], r["doc_corpus"]) for r in got}
    assert pairs == {(10, 0), (10, 1), (11, 0), (11, 1)}
    assert all(r["jaccard"] == 1.0 for r in got)
    for h in (getattr(crossdup_pairs(docs, is_new=F.col("doc_id") >= 10), "_wqs_persisted", None),):
        if h is not None:
            h.unpersist()


def test_passjoin_exact_vs_brute_force(spark):
    """PassJoin segment pigeonhole is output-COMPLETE (exact equality with
    all-pairs ground truth, not a subset) on an adversarial variable-length
    corpus: random word strings of widely varying lengths plus planted
    insertions (shift every downstream segment) and double-deletions
    (change the length bucket), so the candidate-length enumeration, the
    uneven-segment remainder arithmetic, and the ±τ shift window are all
    exercised.  Token blocking (fuzzy_key_pairs) would MISS the
    front-insertion near-dup below; PassJoin must find it."""
    import random

    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.dedup import passjoin_pairs

    rng = random.Random(7)
    words = ["data", "spark", "row", "agg", "key", "x", "joiner", "tbl"]
    base = [" ".join(rng.choices(words, k=rng.randint(1, 7))) for _ in range(100)]
    mut = []
    for i, s in enumerate(base):
        if i % 3 == 0 and len(s) > 4:
            p = rng.randrange(len(s))
            mut.append(s[:p] + rng.choice("abcq ") + s[p:])  # insertion
        if i % 4 == 0 and len(s) > 5:
            p = rng.randrange(len(s) - 1)
            mut.append(s[:p] + s[p + 2:])  # double deletion
    texts = base + mut + ["zz" + base[0]]  # front insert: first token differs
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )

    got = sorted(map(tuple, passjoin_pairs(docs, max_edits=3).collect()))

    key = F.substring(
        F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, 32
    )
    k = docs.select("doc_id", key.alias("k")).filter(F.length("k") > 3)
    brute = sorted(
        map(
            tuple,
            k.alias("a")
            .crossJoin(k.alias("b"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.levenshtein("a.k", "b.k", 3).cast("long").alias("edits"),
            )
            .filter(F.col("edits") >= 0)
            .collect(),
        )
    )
    assert got == brute  # exact, both directions — completeness AND no dups
    front_id = len(texts) - 1
    assert any(a == 0 and b == front_id for a, b, _ in got)


def test_passjoin_hypothesis_fuzz(spark):
    """Hypothesis fuzz of the PassJoin exactness claim: random low-alphabet
    strings (collisions and near-dups arise naturally, lengths straddle the
    τ+1 segment boundaries) must match an all-pairs threshold-Levenshtein
    brute force exactly.  Few examples — each is a Spark job — but each
    example is an adversarial corpus the deterministic test above can't
    enumerate."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wolf_quake_spark.analysis.dedup import passjoin_pairs

    def lev(a, b, tau):
        la, lb = len(a), len(b)
        if abs(la - lb) > tau:
            return -1
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            if min(cur) > tau:
                return -1
            prev = cur
        return prev[lb] if prev[lb] <= tau else -1

    import re

    def norm(s):
        return re.sub(r"[ \t\n\x0b\f\r]+", " ", s).lower()[:32]

    @settings(max_examples=6, deadline=None)
    @given(
        texts=st.lists(
            st.text(alphabet="ab x", min_size=0, max_size=40),
            min_size=4, max_size=18,
        )
    )
    def run(texts):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = sorted(map(tuple, passjoin_pairs(docs, max_edits=3).collect()))
        keys = {i: norm(t) for i, t in enumerate(texts) if len(norm(t)) > 3}
        import itertools

        exp = sorted(
            (a, b, d)
            for a, b in itertools.combinations(sorted(keys), 2)
            if (d := lev(keys[a], keys[b], 3)) >= 0
        )
        assert got == exp

    run()


def test_edjoin_exact_vs_brute_force(spark):
    """Ed-Join (global-rarity q-gram prefix filter) is output-COMPLETE:
    exact equality with all-pairs threshold-Levenshtein ground truth on a
    corpus with planted near-dups, including repetitive low-distinct-gram
    strings ("aaaa…") that would break a DISTINCT-gram count filter — the
    occurrence-numbered multiset elements must handle them."""
    import random

    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.dedup import edjoin_pairs

    rng = random.Random(11)
    words = ["data", "spark", "row", "agg", "key", "x", "joiner", "tbl"]
    base = [" ".join(rng.choices(words, k=rng.randint(1, 6))) for _ in range(80)]
    mut = []
    for i, s in enumerate(base):
        if i % 3 == 0 and len(s) > 4:
            p = rng.randrange(len(s))
            mut.append(s[:p] + rng.choice("abq ") + s[p:])  # insertion
        if i % 4 == 0 and len(s) > 6:
            p = rng.randrange(len(s) - 1)
            mut.append(s[:p] + s[p + 2:])  # double deletion
    # repetitive keys: 1 distinct gram, many occurrences — the multiset case
    texts = base + mut + ["aaaaaaaaaa", "aaaaaaaaa", "aaaaabaaaa"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )

    got = sorted(map(tuple, edjoin_pairs(docs, max_edits=2).collect()))

    key = F.substring(
        F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, 24
    )
    k = docs.select("doc_id", key.alias("k")).filter(F.length("k") >= 6)
    brute = sorted(
        map(
            tuple,
            k.alias("a")
            .crossJoin(k.alias("b"))
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.levenshtein("a.k", "b.k", 2).cast("long").alias("edits"),
            )
            .filter(F.col("edits") >= 0)
            .collect(),
        )
    )
    assert got == brute
    # the repetitive triple must pair up (1 and 2 edits respectively)
    n = len(texts)
    rep = {(a, b): d for a, b, d in got if a >= n - 3}
    assert rep[(n - 3, n - 2)] == 1 and rep[(n - 3, n - 1)] == 1


def test_edjoin_hypothesis_fuzz(spark):
    """Hypothesis fuzz of the Ed-Join exactness claim: random low-alphabet
    strings vs an all-pairs threshold-Levenshtein brute force — exercises
    the count-filter boundary (keys right at length q(τ+1)), gram-df ties,
    and occurrence numbering under heavy gram repetition."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from wolf_quake_spark.analysis.dedup import edjoin_pairs

    def lev(a, b, tau):
        la, lb = len(a), len(b)
        if abs(la - lb) > tau:
            return -1
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            if min(cur) > tau:
                return -1
            prev = cur
        return prev[lb] if prev[lb] <= tau else -1

    import re

    def norm(s):
        return re.sub(r"[ \t\n\x0b\f\r]+", " ", s).lower()[:24]

    @settings(max_examples=6, deadline=None)
    @given(
        texts=st.lists(
            st.text(alphabet="ab x", min_size=0, max_size=30),
            min_size=4, max_size=18,
        )
    )
    def run(texts):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = sorted(map(tuple, edjoin_pairs(docs, max_edits=2).collect()))
        keys = {i: norm(t) for i, t in enumerate(texts) if len(norm(t)) >= 6}
        import itertools

        exp = sorted(
            (a, b, d)
            for a, b in itertools.combinations(sorted(keys), 2)
            if (d := lev(keys[a], keys[b], 2)) >= 0
        )
        assert got == exp

    run()


def test_line_dedup_first_occurrence_wins(spark):
    """C4 line dedup: duplicate lines dropped everywhere but the global
    first occurrence (lowest (doc_id, idx)); survivors reassemble in
    original order; a fully-duplicated doc survives as an empty row."""
    from wolf_quake_spark.analysis.dedup import line_dedup

    # words_per_line=2 → lines are 2-word windows
    rows = [
        (0, "a b c d"),          # lines: "a b", "c d"
        (1, "a b x y"),          # "a b" duplicates doc 0's first line
        (2, "c d a b"),          # both lines are duplicates
        (3, "z z z"),            # "z z", "z" — unique
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in line_dedup(docs, words_per_line=2).collect()
    }
    assert got[0] == ("a b c d", 2, 0)
    assert got[1] == ("x y", 1, 1)
    assert got[2] == ("", 0, 2)
    assert got[3] == ("z z z", 2, 0)


def test_mmr_downranks_near_duplicates(spark):
    """MMR must NOT return k copies of the best hit: with three near-copies
    of the top document in the pool, plain top-4 returns all three copies;
    MMR's redundancy penalty pushes the orthogonal documents in ahead of
    the copies."""
    from wolf_quake_spark.analysis.similarity import mmr_topk, topk

    # query direction [1,0,0]; three near-copies of the best hit; two
    # orthogonal-ish docs with moderate relevance
    vecs = [
        (1, [1.0, 0.01, 0.0]),
        (2, [1.0, 0.012, 0.0]),
        (3, [0.99, 0.011, 0.0]),
        (4, [0.6, 0.0, -0.8]),
        (5, [0.6, 0.0, 0.8]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qv = [1.0, 0.0, 0.0]

    plain = [r.vec_id for r in topk(emb, qv, k=4).collect()]
    assert set(plain[:3]) == {1, 2, 3}  # top-k drowns in copies

    got = mmr_topk(emb, qv, k=4, pool=5, lam=0.5, mu=0.5).collect()
    order = [r.vec_id for r in sorted(got, key=lambda r: r.sel_rank)]
    # first pick = most relevant; then the two diverse docs (redundancy
    # penalty ≈ their relevance·mu, so they edge out the near-copies whose
    # penalty ≈ mu·1); a copy only re-enters at rank 4
    assert order[0] == 1
    assert set(order[1:3]) == {4, 5}
    assert order[3] in {2, 3}


def test_leakage_safe_split_no_straddle(spark):
    """Component-keyed splitting puts every near-dup cluster entirely in
    one split (the leakage guarantee), on a corpus PLANTED so the naive
    per-doc hash split provably straddles: two identical docs whose doc_ids
    hash to different splits."""
    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.dedup import dedup_components

    def bucket(i):
        return ((i * 2654435761) % 4294967296) % 1000

    # find a train-bucket id and a test-bucket id for the identical pair
    a = next(i for i in range(1000) if bucket(i) < 800)
    b = next(i for i in range(1000) if bucket(i) >= 900)
    dup_text = "the same long duplicated document body with many words " * 3
    rows = [(a, dup_text), (b, dup_text)] + [
        (1000 + i, f"unique filler document number {i} with distinct tokens {i}")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    comp = dedup_components(docs, threshold=0.5)
    bk = ((F.col("component_id") * F.lit(2654435761)) % F.lit(4294967296)) % F.lit(1000)
    split = F.when(bk < 800, "train").when(bk < 900, "val").otherwise("test")
    got = comp.select("doc_id", "component_id", split.alias("split")).collect()
    h = getattr(comp, "_wqs_persisted", None)
    for x in (h if isinstance(h, list) else [h]) if h is not None else []:
        x.unpersist()

    by_comp = {}
    for r in got:
        by_comp.setdefault(r.component_id, set()).add(r.split)
    # leakage guarantee: no component straddles splits
    assert all(len(s) == 1 for s in by_comp.values())
    # the planted pair IS one component…
    cids = {r.component_id for r in got if r.doc_id in (a, b)}
    assert len(cids) == 1
    # …and the naive per-doc split WOULD have straddled it
    assert bucket(a) < 800 <= bucket(b)


def test_spherical_kmeans_clusters_by_direction(spark):
    """metric='cos' changes the Lloyd objective, not just the tie-break:
    on a corpus with two directions ~26° apart at 1× and 100× magnitudes,
    spherical k-means partitions by DIRECTION (the cosine-relevant
    structure) while L2 k-means partitions by MAGNITUDE — the exact failure
    an L2 quantizer exhibits under a cosine search metric."""
    from wolf_quake_spark.analysis.similarity import kmeans_assign

    vecs = [
        (0, [1.0, 0.0]), (1, [1.1, 0.05]), (2, [0.9, 0.44]), (3, [1.0, 0.48]),
        (4, [100.0, 0.0]), (5, [110.0, 5.0]), (6, [90.0, 44.0]), (7, [100.0, 48.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    def parts(metric):
        a = kmeans_assign(emb, k=2, iters=6, metric=metric)
        rows = {r.vec_id: r.cent_id for r in a.collect()}
        h = getattr(a, "_wqs_persisted", None)
        for x in (h if isinstance(h, list) else [h]) if h is not None else []:
            x.unpersist()
        return frozenset(
            frozenset(v for v, c in rows.items() if c == cid)
            for cid in set(rows.values())
        )

    by_direction = frozenset({frozenset({0, 1, 4, 5}), frozenset({2, 3, 6, 7})})
    by_magnitude = frozenset({frozenset({0, 1, 2, 3}), frozenset({4, 5, 6, 7})})
    assert parts("cos") == by_direction
    assert parts("l2") == by_magnitude


def test_cap_observability_metrics(spark):
    """Silent-cap observability: winnow's max_df and the LSH bucket cap
    report exactly what they dropped, via a CollectMetrics node in the same
    job — values checked against hand-computed fixture counts."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.dedup import (
        candidate_pairs,
        winnow_fingerprints,
        winnow_neardup_pairs,
    )

    # --- winnow: one boilerplate footer shared by ALL docs + unique bodies
    footer = "standard legal footer text block"
    rows = [(i, f"unique body {i} {'x' * i} with words. {footer}") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(docs)
    freq = {
        r["fingerprint"]: r["n"]
        for r in fp.groupBy("fingerprint").agg(F.count("*").alias("n")).collect()
    }
    max_df = 4
    exp_dropped = sum(1 for v in freq.values() if v > max_df)
    exp_postings = sum(v for v in freq.values() if v > max_df)
    assert exp_dropped > 0  # the footer fingerprints exceed the cap
    obs = Observation("winnow_caps")
    out = winnow_neardup_pairs(docs, max_df=max_df, observation=obs)
    out.collect()
    m = obs.get
    assert m["fingerprints_total"] == len(freq)
    assert m["fingerprints_dropped"] == exp_dropped
    assert m["postings_dropped"] == exp_postings

    # --- LSH: near-identical docs pile into one band bucket; cap drops it
    rows = [(i, f"the quick brown fox jumps over the lazy dog {i % 2}") for i in range(8)]
    rows += [(100 + i, f"completely different text number {i} about {i*7}") for i in range(3)]
    docs2 = spark.createDataFrame(rows, "doc_id long, text string")
    obs2 = Observation("lsh_caps")
    capped = candidate_pairs(docs2, max_bucket=3, observation=obs2)
    n_capped = capped.count()
    m2 = obs2.get
    assert m2["buckets_dropped"] >= 1 and m2["postings_dropped"] > 3
    assert m2["buckets_total"] > m2["buckets_dropped"]
    # uncapped run has strictly more candidates, and uncapped observation
    # reports zero dropped
    obs3 = Observation("lsh_uncapped")
    uncapped = candidate_pairs(docs2, observation=obs3)
    assert uncapped.count() > n_capped
    m3 = obs3.get
    assert m3["buckets_dropped"] == 0 and m3["postings_dropped"] == 0
    assert m3["buckets_total"] == m2["buckets_total"]
    for df in (capped, uncapped):
        df._wqs_persisted.unpersist()

    # --- fuzzy blocking: max_block cap + metrics, hand-computed
    from wolf_quake_spark.analysis.dedup import fuzzy_key_pairs

    rows = [(i, f"terms of service rev {i}") for i in range(10)]
    rows += [(100 + i, f"note {i} unique") for i in range(3)]
    docs3 = spark.createDataFrame(rows, "doc_id long, text string")
    obs4 = Observation("fuzzy_caps")
    out = fuzzy_key_pairs(docs3, max_block=5, observation=obs4)
    got = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    m4 = obs4.get
    # blocks: 'terms' (10 docs, dropped), 'note' (3 docs, kept)
    assert m4["blocks_total"] == 2
    assert m4["blocks_dropped"] == 1 and m4["postings_dropped"] == 10
    assert all(a >= 100 and b >= 100 for a, b in got)  # hot block excluded
    out._wqs_persisted.unpersist()


def test_kmeans_parallel_seeding_separates_blobs(spark):
    """k-means‖-style seeding must place seeds across well-separated blobs
    even when every low-vec_id vector sits in ONE blob — the case where the
    old first-k seeding started all centroids in the same cluster.  Also
    exercises the convergence probe: with clean blobs the assignment reaches
    a fixpoint well before the iteration cap."""
    from pyspark.sql import functions as F

    from wolf_quake_spark.analysis.similarity import kmeans_assign

    # 24 vectors: ids 0..11 cluster tightly around (10,0,0,0); ids 12..23
    # around (0,10,0,0) — first-k seeding would seed only blob A
    rows = [(i, [10.0 + (i % 3) * 0.1, 0.0, 0.0, 0.0]) for i in range(12)]
    rows += [(12 + i, [0.0, 10.0 + (i % 3) * 0.1, 0.0, 0.0]) for i in range(12)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["cent_id"]
        for r in kmeans_assign(vecs, iters=8).collect()  # derived k = 5
    }
    blob_a = {got[i] for i in range(12)}
    blob_b = {got[12 + i] for i in range(12)}
    assert blob_a.isdisjoint(blob_b)  # no centroid straddles the two blobs
    # deterministic across runs
    again = {r["vec_id"]: r["cent_id"] for r in kmeans_assign(vecs, iters=8).collect()}
    assert got == again


def test_star_components_chain_and_random_agree_with_plain(spark):
    """Large-star/small-star CC: on a diameter-200 chain it converges in
    O(log² n) rounds (plain propagation needs ~200), and on chains, cliques
    and a seeded random graph its labels equal plain propagation's and a
    driver-side union-find."""
    import hashlib

    from wolf_quake_spark.analysis.dedup import label_propagate, label_propagate_star

    def run(pairs_py, n_nodes, max_plain=300, compare_plain=True):
        nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
        pairs = spark.createDataFrame(pairs_py, "doc_a long, doc_b long")
        star = label_propagate_star(nodes, pairs)
        star_rows = {r["doc_id"]: r["component_id"] for r in star.collect()}
        rounds = star._wqs_rounds
        star._wqs_persisted.unpersist()
        plain_rows = None
        if compare_plain:
            plain = label_propagate(nodes, pairs, max_iter=max_plain)
            plain_rows = {r["doc_id"]: r["component_id"] for r in plain.collect()}
            plain._wqs_persisted.unpersist()
        # driver-side union-find ground truth
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs_py:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        truth = {i: find(i) for i in range(n_nodes)}
        assert star_rows == truth
        if plain_rows is not None:
            assert plain_rows == truth
        return rounds

    # adversarial chain: diameter 199 — star must converge in ≪ 199 rounds
    # (plain propagation would need 199 rounds; union-find is the referee)
    chain = [(i, i + 1) for i in range(199)]
    rounds = run(chain, 200, compare_plain=False)
    assert rounds <= 12, rounds
    # plain propagation with lineage truncation survives a medium chain and
    # agrees (the localCheckpoint-every-5-rounds path)
    run([(i, i + 1) for i in range(40)], 45, max_plain=60)

    # clique + singletons + two chains merging
    clique = [(a, b) for a in range(10) for b in range(a + 1, 10)]
    merge = [(20 + i, 21 + i) for i in range(10)] + [(40 + i, 41 + i) for i in range(10)]
    merge += [(25, 45)]
    run(clique + merge, 60)

    # seeded pseudo-random sparse graph on 120 nodes
    def h(i):
        return int(hashlib.md5(f"edge{i}".encode()).hexdigest()[:8], 16)

    rand = [(h(i) % 120, h(i + 1000) % 120) for i in range(90)]
    rand = [(a, b) for a, b in rand if a != b]
    run(rand, 120)


def test_ppjoin_exact_vs_brute_force(spark):
    """PPJoin rarest-first prefix filtering is output-COMPLETE (exact
    equality with all-pairs shingle-Jaccard ground truth) on an adversarial
    corpus: exact dups (J=1), planted high-overlap mutations straddling the
    3/5 threshold, heavy shared boilerplate (frequent shingles that must
    NOT flood candidates — they never enter a rarest-first prefix), and
    size-ratio edge cases right at t*|b| = |a|.  The integer-fraction
    threshold is exercised on exact-boundary pairs (5*inter == 3*union)."""
    import random

    from wolf_quake_spark.analysis.dedup import ppjoin_pairs, word_shingles

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
             "iota", "kappa", "lam", "mu", "nu", "xi", "omi", "pi"]
    boiler = "terms of service apply to all users"  # shared frequent opener
    base = [
        boiler + " " + " ".join(rng.choices(vocab, k=rng.randint(6, 20)))
        for _ in range(60)
    ]
    texts = list(base)
    for i, s in enumerate(base):
        if i % 4 == 0:
            texts.append(s)  # exact duplicate, J = 1
        if i % 5 == 0:
            w = s.split()
            p = rng.randrange(len(w))
            w[p] = "MUT"  # single word swap: high but sub-1 overlap
            texts.append(" ".join(w))
        if i % 7 == 0:
            texts.append(s + " tail words appended here now")  # size-ratio edge
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    got = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in ppjoin_pairs(docs).collect()
    )

    # brute force over the same distinct 3-shingle sets
    sets: dict[int, set] = {}
    for r in word_shingles(docs).collect():
        sets.setdefault(r["doc_id"], set()).add(r["shingle"])
    want = []
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and 5 * inter >= 3 * union:
                want.append((a, b, round(inter / union, 9)))
    assert got == sorted(want)
    assert any(j == 1.0 for _, _, j in got)  # exact dups present
    assert len(got) < len(ids) * (len(ids) - 1) // 4  # boilerplate didn't flood


def test_knn_classify_separable_clusters(spark):
    """On a corpus of two well-separated embedding clusters with consistent
    labels, every held-out probe (vec_id % 10 == 0) must be voted its own
    cluster's label through the IVF routing; a probe whose cell holds no
    labeled candidate yields no row (never a NULL prediction)."""
    from wolf_quake_spark.analysis.similarity import knn_classify

    rows = []
    for i in range(40):
        if i % 2 == 0:
            vec, lab = [1.0, 0.0, 0.01 * (i % 5)], "even"
        else:
            vec, lab = [-1.0, 0.0, -0.01 * (i % 5)], "odd"
        rows.append((i, vec, lab))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    got = {r["vec_id"]: r for r in knn_classify(emb, k=5).collect()}
    assert got, "no probes classified"
    for vid, r in got.items():
        assert vid % 10 == 0
        assert r["pred_label"] == r["true_label"], (vid, r)
        assert r["correct"] == 1 and 1 <= r["n_votes"] <= 5


def test_hashed_features_mirrors_reference_hash(spark):
    """hashed_features folds token counts into signed buckets exactly as
    the md5-instr reference computed in plain Python; zero-sum collision
    cells are dropped."""
    import hashlib
    from collections import defaultdict

    from wolf_quake_spark.analysis.textstats import hashed_features

    texts = ["a b b c", "c c a", "", "d d d d e"]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    n_features = 16  # tiny bucket space to force collisions

    def bucket_sign(tok):
        h = hashlib.md5(tok.encode()).hexdigest()
        h20 = 0
        for i in range(5):
            h20 = h20 * 16 + int(h[i], 16)
        return h20 % n_features, 1 if int(h[5], 16) % 2 == 0 else -1

    want = defaultdict(int)
    for did, text in enumerate(texts):
        for tok in text.split():
            b, s = bucket_sign(tok)
            want[(did, b)] += s
    want = {k: v for k, v in want.items() if v != 0}

    got = {
        (r["doc_id"], r["feature"]): r["value"]
        for r in hashed_features(docs, n_features=n_features).collect()
    }
    assert got == want


def test_count_vectorizer_df_bounds_and_rank(spark):
    """min_df floors rare terms, the max_df integer ceiling drops corpus-wide
    stopwords, and term ids are dense 1..V in (df desc, term asc) order."""
    from wolf_quake_spark.analysis.textstats import count_vectorizer

    # 10 docs: "the" in all 10 (df=10 > 4/5*10=8 → dropped), "rare" in 1
    # (< min_df=2 → dropped), "spark" in 6, "data" in 6 (tie → alpha),
    # "join" in 3
    texts = []
    for i in range(10):
        t = ["the"]
        if i < 6:
            t += ["spark", "data"]
        if i < 3:
            t.append("join")
        if i == 0:
            t.append("rare")
        texts.append(" ".join(t))
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    out = count_vectorizer(docs, min_df=2).collect()
    vocab = {r["term"]: r["term_id"] for r in out}
    assert vocab == {"data": 1, "spark": 2, "join": 3}
    assert all(r["tf"] == 1 for r in out)
    assert len(out) == 6 + 6 + 3


def test_pq_train_identity_and_codebook_shape(spark):
    """PQ codes: identical vectors share all m codes; the codebook holds at
    most m*ks codewords of width dim/m; every vector gets exactly m codes."""
    from wolf_quake_spark.analysis.similarity import pq_train

    rows = [
        (0, [1.0, 0.0, 2.0, 0.0, 0.5, 0.5, 3.0, 1.0]),
        (1, [1.0, 0.0, 2.0, 0.0, 0.5, 0.5, 3.0, 1.0]),  # identical to 0
        (2, [-1.0, 4.0, 0.0, 1.0, 2.0, 2.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0, 9.0, 9.0, 9.0, 9.0]),
        (4, [1.1, 0.0, 2.0, 0.1, 0.5, 0.4, 3.0, 1.0]),  # close to 0
    ]
    vecs8 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes, cb = pq_train(vecs8, m=2, iters=2)
    got = {(r["vec_id"], r["sub_id"]): r["code_id"] for r in codes.collect()}
    # every vector encoded in every subspace
    assert set(got) == {(v, s) for v in range(5) for s in range(2)}
    # identical vectors -> identical codes in both subspaces
    assert got[(0, 0)] == got[(1, 0)] and got[(0, 1)] == got[(1, 1)]
    cb_rows = cb.collect()
    assert all(len(r["cvec"]) == 4 for r in cb_rows)  # dim/m = 8/2
    assert len(cb_rows) <= 2 * 2 * 2  # m * ks with ks = derived_ks(5) = 2
    # deterministic: retrain reproduces the exact assignment
    codes2, _ = pq_train(vecs8, m=2, iters=2)
    assert {(r["vec_id"], r["sub_id"]): r["code_id"] for r in codes2.collect()} == got


def test_pq_adc_ranks_near_vectors_first(spark):
    """ADC distance of an exact-duplicate query is minimal, and the far
    cluster ranks last; recall gauge reads 10/10 when k covers the corpus."""
    from wolf_quake_spark.analysis.similarity import pq_adc_topk, pq_recall_at_k

    rows = [(i, [float(i // 4) * 10 + j * 0.1 for j in range(8)]) for i in range(8)]
    vecs8 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [j * 0.1 for j in range(8)]  # == vec 0..3's cluster centre shape
    out = pq_adc_topk(vecs8, q, m=2, iters=2, k=8).collect()
    order = [r["vec_id"] for r in out]
    assert set(order[:4]) == {0, 1, 2, 3}  # near cluster first
    assert out[0]["adc_d2"] <= out[-1]["adc_d2"]
    rec = pq_recall_at_k(vecs8, q, m=2, iters=2, k=8).collect()[0]
    assert rec["n_overlap"] == 8 and rec["recall_at_8"] == 1.0


def test_ivfpq_finds_exact_duplicate_first(spark):
    """IVFADC: an exact-duplicate query lands in the probed cell with
    residual distance equal to the codeword quantization error — it must
    rank first; the scan never touches unprobed cells' vectors."""
    from wolf_quake_spark.analysis.similarity import ivfpq_search

    rows = [(i, [float(i // 8) * 50 + (j % 3) * 0.5 + (i % 8) * 0.01
                 for j in range(8)]) for i in range(24)]
    vecs8 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = [0 * 50 + (j % 3) * 0.5 + 5 * 0.01 for j in range(8)]  # == vec 5
    out = ivfpq_search(vecs8, q, m=2, iters=2, n_probes=2, k=5).collect()
    assert out[0]["vec_id"] == 5
    assert out[0]["adc_d2"] <= min(r["adc_d2"] for r in out)
    # deterministic: a re-run returns the identical ranking
    again = ivfpq_search(vecs8, q, m=2, iters=2, n_probes=2, k=5).collect()
    assert [(r["vec_id"], r["adc_d2"]) for r in again] == [
        (r["vec_id"], r["adc_d2"]) for r in out
    ]


def test_hard_negatives_picks_boundary_candidates(spark):
    """Anchor vec 0 shares a cell with a same-label near-dup and a
    different-label near-dup: the positive must be the same-label one, the
    hard negative the different-label one, margin = cos difference; anchors
    without both kinds of cell-mate yield no row."""
    from wolf_quake_spark.analysis.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 1),   # anchor (vec_id % 10 == 0)
        (1, [0.99, 0.1, 0.0, 0.0], 1),  # same-label near-dup -> positive
        (2, [0.95, 0.2, 0.0, 0.0], 2),  # diff-label near-dup -> hard negative
        (3, [0.9, 0.3, 0.0, 0.0], 1),   # same-label, farther
        (10, [-1.0, 0.0, 0.0, 0.0], 1), # anchor in the opposite cluster
        (11, [-0.98, 0.1, 0.0, 0.0], 1),# same-label mate only -> no row
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = {r["vec_id"]: r for r in hard_negatives(vecs, holdout_mod=10).collect()}
    assert set(out) <= {0, 10}
    assert 0 in out
    r0 = out[0]
    assert r0["pos_id"] == 1 and r0["neg_id"] == 2
    assert r0["pos_cos"] > r0["neg_cos"] > 0.9
    # margin is rounded from the UNROUNDED cosines, so compare loosely
    assert abs(r0["margin"] - (r0["pos_cos"] - r0["neg_cos"])) < 1e-5
    # anchor 10's cell has no different-label mate -> dropped (inner join)
    assert 10 not in out
