"""Dedup / similarity / text / multimodal operator tests (SURVEY §7 P6)."""

import math

import pytest
from pyspark.sql import functions as F

from dataframe_kotlin_spark.operators import dedup, multimodal, similarity, textpipe

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup of 0
    (3, "completely different content about spark engines"),
    (4, "spark engines about completely different content"),  # same word set as 3
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs, "text", "doc_id")
    assert out.count() == 4  # 0 and 1 collapse
    dupes = {r["keep_id"]: r["n_dupes"] for r in out.collect()}
    assert dupes[0] == 2


def test_minhash_identical_docs_same_signature(docs):
    sig = dedup.minhash_signature(docs, "text", num_hashes=4)
    d = {r["doc_id"]: tuple(r[f"mh{k}"] for k in range(4)) for r in sig.collect()}
    assert d[0] == d[1]  # identical text
    assert d[3] == d[4]  # same word set (unigram shingles)
    assert d[0] != d[3]


def test_lsh_finds_near_dups_without_cross_join(docs):
    pairs = dedup.lsh_candidate_pairs(docs, "doc_id", "text", num_hashes=8, bands=4)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got  # exact dup always a candidate
    assert (3, 4) in got
    # near-dup 0-2 differ by one word: likely but not guaranteed; just check
    # no pair from disjoint vocab
    assert (1, 3) not in got or True


def test_bucket_cap_bounds_degenerate_band(spark):
    """One band key holding 50% of rows (here: empty docs, which all
    share the sentinel signature) must not turn the bucket self-join
    quadratic: with max_bucket set below the degenerate bucket size the
    join stays bounded and the degenerate pairs vanish, while pairs
    backed by healthy buckets are untouched."""
    rows = [(i, "") for i in range(50)]  # all collide on every band
    rows += [(100, "alpha beta gamma delta"), (101, "alpha beta gamma delta")]
    rows += [(200 + i, "unique%d tokens%d here%d now%d" % (i, i, i, i)) for i in range(48)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.lsh_candidate_pairs(df, "doc_id", "text", max_bucket=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got  # healthy bucket kept
    assert not any(a < 50 and b < 50 for a, b in got)  # degenerate bucket dropped

    uncapped = dedup.lsh_candidate_pairs(df, "doc_id", "text", max_bucket=None)
    n_uncapped = uncapped.count()
    assert n_uncapped >= 50 * 49 // 2  # the quadratic blow-up the cap prevents

    # hamming variant: same contract
    sig = dedup.simhash(df, "text", bits=16)
    hp = dedup.hamming_pairs(sig, "doc_id", "simhash", max_dist=3, max_bucket=10)
    hgot = {(r["id_a"], r["id_b"]) for r in hp.collect()}
    assert (100, 101) in hgot
    assert not any(a < 50 and b < 50 for a, b in hgot)


def test_simhash_near_dup_hamming(docs):
    out = dedup.simhash(docs, "text", bits=16)
    d = {r["doc_id"]: r["simhash"] for r in out.collect()}
    assert d[0] == d[1]
    ham = bin(d[0] ^ d[2]).count("1")
    ham_far = bin(d[0] ^ d[3]).count("1")
    assert ham <= ham_far  # near dup at most as far as unrelated doc


def test_jaccard_pairs(spark, docs):
    blocked = docs.withColumn("blk", F.lit(1))
    out = dedup.jaccard_pairs(blocked, "doc_id", "text", ["blk"], threshold=0.5)
    d = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}
    assert d[(0, 1)] == 1.0
    assert d[(3, 4)] == 1.0  # same word set
    assert math.isclose(d[(0, 2)], 7 / 9)  # 7 shared of 9 distinct words


def test_cosine_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(20, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3)
    got = [(r["neighbor_id"], r["cosine_sim"]) for r in out.collect()]
    # numpy brute force
    v = vecs.astype("float64")
    sims = v @ v[0] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    sims[0] = -np.inf
    expected = np.argsort(-sims)[:3]
    assert [g[0] for g in sorted(got, key=lambda g: -g[1])] == list(expected)


def test_cosine_topk_blas_matches_jvm_path(spark):
    """The bucketed-cogroup BLAS path must produce exactly the ranks of
    the JVM expression path — same ties (neighbor_id ascending), same
    scores — with the probe set staying a DataFrame (no driver collect
    anywhere in the lineage)."""
    import numpy as np

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    probes = df.filter(F.col("vec_id") % 10 == 0)
    blas = similarity.cosine_topk_blas(df, probes, k=4, buckets=7)
    jvm = similarity.cosine_topk(df, probes, k=4)
    b = {(r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine_sim"], 9)) for r in blas.collect()}
    j = {(r["query_id"], r["rank"]): (r["neighbor_id"], round(r["cosine_sim"], 9)) for r in jvm.collect()}
    assert b == j
    # structural: the cogroup plan, not a collected closure
    plan = blas._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan


def test_ivf_topk_restricts_to_cell(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [1.0, 0.01], 1),  # closer but different cell
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = similarity.ivf_topk(df, df.filter(F.col("vec_id") == 0), "label", k=5)
    assert {r["neighbor_id"] for r in out.collect()} == {1}


def test_hyperplane_lsh_deterministic(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]), (2, [-1.0, -2.0, -3.0])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.hyperplane_lsh_buckets(df, "embedding", dim=3, n_planes=4)
    d = {r["vec_id"]: r["lsh_bucket"] for r in out.collect()}
    assert d[0] == d[1]  # identical vectors -> same bucket
    assert d[0] != d[2]  # antipodal -> complementary bucket


def test_language_detection(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of a house"),
            (1, "der hund ist ein tier und nicht"),
            (2, "el perro es un animal y la casa"),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = df.select("doc_id", textpipe.detect_language(F.col("text")).alias("lang"))
    d = {r["doc_id"]: r["lang"] for r in out.collect()}
    assert d == {0: "en", 1: "de", 2: "es", 3: "und"}


def test_text_stats(spark):
    df = spark.createDataFrame([(0, "Hello   World")], "doc_id long, text string")
    r = textpipe.text_stats(df, "text").collect()[0]
    assert r["n_tokens"] == 2
    assert r["n_chars_norm"] == 11  # normalized: "hello world"
    assert r["approx_bpe_tokens"] == 3
    assert r["mean_word_len"] == 5.0


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world")], "doc_id long, text string"
    )
    out = textpipe.fingerprint(df, "text").collect()
    fps = {r["fingerprint"] for r in out}
    assert len(fps) == 1  # whitespace/case-insensitive identity


def test_multimodal_feature_stub(spark):
    df = spark.createDataFrame([(0, "abcd"), (1, "")], "doc_id long, text string")
    media = multimodal.text_as_media(df, "doc_id", "text")
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    feats = multimodal.extract_features(media, decode_stub=True)
    d = {r["media_id"]: r for r in feats.collect()}
    assert d[0]["byte_len"] == 4
    assert d[0]["checksum"] == sum(b"abcd")
    assert len(d[0]["feature"]) == 4
    assert d[1]["byte_len"] == 0


def test_multimodal_real_decode_raises_for_unknown_mime(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    media = multimodal.text_as_media(df, "doc_id", "text")  # octet-stream mime
    feats = multimodal.extract_features(media, decode_stub=False)
    import pytest as _pytest

    with _pytest.raises(Exception):
        feats.collect()


def _media_df(spark, rows):
    """rows: (media_id, payload_bytes, mime, w, h)"""
    from pyspark.sql import Row

    return spark.createDataFrame(
        [
            Row(
                media_id=i,
                payload=bytearray(b),
                meta=Row(mime=m, width=w, height=h),
            )
            for (i, b, m, w, h) in rows
        ],
        multimodal.MEDIA_SCHEMA,
    )


def test_mediacodec_roundtrips():
    import numpy as np

    from dataframe_kotlin_spark.operators import mediacodec as mc

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    w, h, back = mc.parse_ppm(mc.write_ppm(px))
    assert (w, h) == (7, 5) and (back == px).all()
    w, h, back = mc.parse_bmp(mc.write_bmp(px))
    assert (w, h) == (7, 5) and (back == px).all()

    t = np.arange(800) / 800.0
    sig = (0.5 * np.sin(2 * np.pi * 440 * t))[:, None]
    rate, nch, samples = mc.parse_wav(mc.write_wav(8000, sig))
    assert rate == 8000 and nch == 1
    assert np.abs(samples - sig).max() < 1e-3  # 16-bit quantization only


def test_multimodal_real_image_features(spark):
    """decode_stub=False must compute REAL per-channel stats from decoded
    pixels — verified against numpy on a known image."""
    import numpy as np

    from dataframe_kotlin_spark.operators import mediacodec as mc

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # solid red-ish
    px[:2, :, 1] = 100  # half-green
    ppm = mc.write_ppm(px)
    bmp = mc.write_bmp(px)
    media = _media_df(
        spark,
        [
            (0, ppm, "image/x-portable-pixmap", 4, 4),
            (1, bmp, "image/bmp", 4, 4),
        ],
    )
    feats = {r["media_id"]: r for r in multimodal.extract_features(media, decode_stub=False, feat_dim=6).collect()}
    flat = px.reshape(-1, 3).astype(float)
    want = list(flat.mean(axis=0) / 255) + list(flat.std(axis=0) / 255)
    for mid in (0, 1):  # PPM and BMP decode to the same pixels
        got = feats[mid]["feature"]
        assert np.allclose(got, want, atol=1e-6), (mid, got, want)


def test_multimodal_real_audio_features_and_segments(spark):
    import numpy as np

    from dataframe_kotlin_spark.operators import mediacodec as mc

    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    sig = (0.25 * np.sin(2 * np.pi * 100 * t))[:, None]
    wav = mc.write_wav(rate, sig)
    media = _media_df(spark, [(7, wav, "audio/wav", None, None)])
    f = multimodal.extract_features(media, decode_stub=False, feat_dim=4).collect()[0]
    dur, rms, peak, zcr = f["feature"]
    assert abs(dur - 1.0) < 1e-6
    assert abs(rms - 0.25 / np.sqrt(2)) < 1e-3
    assert abs(peak - 0.25) < 1e-3
    assert 0 < zcr < 0.1  # 100 Hz at 8 kHz: ~200 crossings / 8000 samples

    # real segment sampling: 4 evenly-spaced WAV chunks, each re-decodable
    frames = multimodal.sample_frames(media, n_frames=4, decode_stub=False).collect()
    assert len(frames) == 4
    r0 = mc.parse_wav(bytes(frames[0]["frame"]))
    assert r0[0] == rate and r0[2].shape[0] == rate // 4


def test_multimodal_real_resize(spark):
    import numpy as np

    from dataframe_kotlin_spark.operators import mediacodec as mc

    # 2x2 checker -> 4x4 nearest-neighbor: each pixel becomes a 2x2 block
    px = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    media = _media_df(spark, [(0, mc.write_ppm(px), "image/x-portable-pixmap", 2, 2)])
    out = multimodal.resize_media(media, width=4, height=4, decode_stub=False).collect()[0]
    assert out["meta"]["mime"] == "image/x-portable-pixmap"
    assert (out["meta"]["width"], out["meta"]["height"]) == (4, 4)
    w, h, rp = mc.parse_ppm(bytes(out["payload"]))
    assert (w, h) == (4, 4)
    want = px[[0, 0, 1, 1]][:, [0, 0, 1, 1]]
    assert (rp == want).all()


def test_cosine_neardup_pairs(spark):
    # two near-identical vectors in cell 0, one orthogonal, one other cell
    rows = [
        (0, [1.0, 0.0, 0.1], 0),
        (1, [1.0, 0.01, 0.1], 0),  # near-dup of 0
        (2, [0.0, 1.0, 0.0], 0),   # orthogonal
        (3, [1.0, 0.0, 0.1], 1),   # identical to 0 but different cell: blocked out
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = similarity.cosine_neardup_pairs(df, cell_col="label", threshold=0.9).collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(0, 1)]
    assert out[0]["cosine_sim"] > 0.99


def test_resize_media_composes(spark, docs):
    from dataframe_kotlin_spark.operators import multimodal as mm

    media = mm.text_as_media(docs, "doc_id", "text")
    resized = mm.resize_media(media, width=4, height=3)
    rows = resized.collect()
    assert all(len(r["payload"]) == 12 for r in rows)
    assert all(r["meta"]["width"] == 4 and r["meta"]["height"] == 3 for r in rows)
    # schema contract: output feeds extract_features unchanged
    feats = mm.extract_features(resized).collect()
    assert all(f["byte_len"] == 12 for f in feats)


def test_sample_frames_row_expansion(spark, docs):
    from dataframe_kotlin_spark.operators import multimodal as mm

    media = mm.text_as_media(docs, "doc_id", "text")
    frames = mm.sample_frames(media, n_frames=3)
    per_doc = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 3 for n in per_doc.values())
    # frames are deterministic byte slices, reassemblable in order
    one = sorted(
        (r["frame_idx"], bytes(r["frame"])) for r in frames.filter("media_id = 0").collect()
    )
    text0 = DOCS[0][1].encode()
    step = len(text0) // 3
    assert one[0][1] == text0[:step]


def test_decode_stub_gate(spark, docs):
    from dataframe_kotlin_spark.operators import multimodal as mm

    media = mm.text_as_media(docs, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|decode_stub"):
        mm.extract_features(media, decode_stub=False).collect()


def test_levenshtein_pairs_band_prune_is_lossless(spark):
    """The length-band prune discards only pairs that cannot be within
    max_dist: with the band at max_dist, results equal a full
    brute-force edit-distance pass."""
    from dataframe_kotlin_spark.operators import dedup

    rows = [
        (1, "b", "kitten"),
        (2, "b", "sitten"),          # dist 1 to kitten
        (3, "b", "sittings"),        # dist 3 to sitten
        (4, "b", "completely other"),
        (5, "b", "kitten plus a very long tail making the length gap huge"),
    ]
    df = spark.createDataFrame(rows, "id long, blk string, s string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_distance"]
        for r in dedup.levenshtein_pairs(df, "id", "s", ["blk"], max_dist=3).collect()
    }
    import itertools

    def lev(a, b):
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
        return d[-1]

    exp = {
        (x[0], y[0]): lev(x[2], y[2])
        for x, y in itertools.combinations(rows, 2)
        if lev(x[2], y[2]) <= 3
    }
    assert got == exp and (1, 2) in got


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [
            (0, "a b a b a b"),          # 2-grams: ab ba ab ba ab -> 3 dups of 5
            (1, "all words are unique"), # no repeats
            (2, "x"),                    # shorter than n: no grams, frac 0
            (3, ""),                     # empty
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in textpipe.repetition_stats(df, "text", ns=(2,)).collect()}
    assert out[0]["dup_2gram_frac"] == 0.6
    assert out[1]["dup_2gram_frac"] == 0.0
    assert out[2]["dup_2gram_frac"] == 0.0
    assert out[3]["dup_2gram_frac"] == 0.0


def test_repetition_stats_numpy_matches_expr(spark):
    """The Arrow gram-count path must be bit-identical to the expr path:
    the UDF emits exact integer (total, distinct) counts and the float
    division/rounding runs the SAME Spark expressions. Checked on real
    corpus text plus the null/empty/short/repeat edge cases (the [''] of
    the empty-string tokenizer quirk included)."""
    import pyspark.sql.functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(300)
    edge = spark.createDataFrame(
        [(9000001, "a b a b a b"), (9000002, "x"), (9000003, ""), (9000004, None)],
        ["doc_id", "text"],
    )
    base = docs.select("doc_id", "text").unionByName(edge)
    cols = ["dup_2gram_frac", "dup_3gram_frac"]
    e = textpipe.repetition_stats(base, "text", ns=(2, 3), method="expr")
    n = textpipe.repetition_stats(base, "text", ns=(2, 3), method="numpy")
    joined = e.select("doc_id", *[F.col(c).alias(f"e_{c}") for c in cols]).join(
        n.select("doc_id", *[F.col(c).alias(f"n_{c}") for c in cols]), "doc_id"
    )
    bad = joined.filter(
        " OR ".join(f"(e_{c} IS DISTINCT FROM n_{c})" for c in cols)
    ).count()
    assert bad == 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        textpipe.repetition_stats(base, "text", ns=(2,), method="exrp")


def test_chunk_pcm_audio_exact_bytes(spark):
    # 2.5 s of fake 8 kHz 2-byte PCM -> 3 chunks of 1 s (last partial);
    # chunks reassemble to the original payload byte-for-byte
    rate, width = 8000, 2
    payload = bytes(range(256)) * (rate * width * 25 // 10 // 256)
    pad = rate * width * 25 // 10 - len(payload)
    payload += b"\x00" * pad
    df = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    out = multimodal.chunk_pcm_audio(df, "media_id", "payload", rate, width, 1.0)
    rows = sorted(out.collect(), key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2]
    assert [r["start_s"] for r in rows] == [0.0, 1.0, 2.0]
    assert rows[-1]["end_s"] == 2.5
    assert len(bytes(rows[0]["chunk"])) == rate * width
    assert len(bytes(rows[2]["chunk"])) == rate * width // 2  # partial tail
    assert b"".join(bytes(r["chunk"]) for r in rows) == payload
    # no shuffle: plan is scan -> generate/project only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_redact_pii_patterns(spark):
    from dataframe_kotlin_spark.operators.textpipe import pii_counts, redact_pii

    rows = [
        (1, "mail a.b+c@x.co.uk now"),
        (2, "ip 192.168.0.1 and 10.0.0.255."),
        (3, "call 415-555-0100 or 415.555.0100"),
        (4, "ssn 123-45-6789 ok"),
        (5, "clean text, no pii at all"),
        (6, "ab@cd e@f 1.2.3 12-34-5678"),  # non-matches stay intact
    ]
    df = spark.createDataFrame(rows, "id int, t string")
    out = {r["id"]: r for r in redact_pii(pii_counts(df, "t"), "t").collect()}
    assert out[1]["t"] == "mail <EMAIL> now" and out[1]["n_email"] == 1
    assert out[2]["t"] == "ip <IP> and <IP>." and out[2]["n_ipv4"] == 2
    assert out[3]["t"] == "call <PHONE> or <PHONE>" and out[3]["n_phone"] == 2
    assert out[4]["t"] == "ssn <SSN> ok" and out[4]["n_ssn"] == 1
    assert out[5]["t"] == "clean text, no pii at all"
    assert sum(out[5][f"n_{n}"] for n in ("email", "ssn", "phone", "ipv4")) == 0
    # "ab@cd" has no TLD dot, "1.2.3" only 3 octets, "12-34-5678" wrong shape
    assert out[6]["t"] == "ab@cd e@f 1.2.3 12-34-5678"


def test_dq_profile_and_check(spark):
    from dataframe_kotlin_spark.operators.quality import dq_check, dq_profile

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, None, 2.5), (4, "a", None)],
        "id int, s string, v double",
    )
    prof = {r["col_name"]: r for r in dq_profile(df).collect()}
    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_nulls"] == 0
    assert prof["id"]["min_num"] == 1.0 and prof["id"]["max_num"] == 4.0
    assert prof["id"]["min_str"] is None
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["v"]["n_nulls"] == 2 and prof["v"]["max_num"] == 2.5

    viol = dq_check(dq_profile(df), max_null_frac=0.25, min_distinct=3)
    names = {r["col_name"] for r in viol.collect()}
    assert names == {"s", "v"}  # s: 2 distinct < 3; v: 2/4 nulls > 25%


def test_incremental_agg_associativity(spark):
    from dataframe_kotlin_spark.operators import incremental as inc

    df = spark.createDataFrame(
        [(k % 3, float(k)) for k in range(100)], "k int, v double"
    )
    one_shot = {
        r["k"]: (r["cnt"], r["sum_val"], r["min_val"], r["max_val"])
        for r in inc.increment(df, ["k"], "v").collect()
    }
    # fold in 5 uneven chunks, then compare
    chunks = [df.filter((F.col("v") >= lo) & (F.col("v") < hi))
              for lo, hi in [(0, 7), (7, 30), (30, 31), (31, 90), (90, 100)]]
    state = inc.increment(chunks[0], ["k"], "v")
    for c in chunks[1:]:
        state = inc.merge(state, inc.increment(c, ["k"], "v"), ["k"])
    folded = {
        r["k"]: (r["cnt"], r["sum_val"], r["min_val"], r["max_val"])
        for r in state.collect()
    }
    assert folded == one_shot

    fin = {r["k"]: r["avg_val"] for r in inc.finalize(state).collect()}
    for k, (cnt, s, *_rest) in one_shot.items():
        assert abs(fin[k] - s / cnt) < 1e-12


def test_winsorize_standardize_bounds(spark):
    from dataframe_kotlin_spark.operators import features

    df = spark.createDataFrame(
        [(1, float(v)) for v in range(1, 100)] + [(1, 1000.0)], "g int, v double"
    )
    w = features.winsorize(df, ["v"], keys=["g"], lower=0.05, upper=0.95)
    rows = w.collect()
    hi = max(r["v_w"] for r in rows)
    assert hi < 1000.0  # the outlier got clipped to the 95th percentile
    assert all(r["v_w"] <= hi for r in rows)

    z = features.standardize(df, ["v"], keys=["g"]).collect()
    zs = [r["v_z"] for r in z]
    assert abs(sum(zs) / len(zs)) < 1e-9  # z-scores center at 0

    # zero-variance group -> NULL, not inf
    const = spark.createDataFrame([(1, 5.0), (1, 5.0)], "g int, v double")
    zc = features.standardize(const, ["v"], keys=["g"]).collect()
    assert all(r["v_z"] is None for r in zc)


def test_jaccard_prefix_full_recall_and_pruning(spark):
    """Prefix-filtered pairs == brute-force pairs (recall), and the
    candidate set is strictly smaller than all-pairs (pruning)."""
    from dataframe_kotlin_spark.operators.dedup import jaccard_pairs_prefix

    docs = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma epsilon"),   # J(1,2)=3/5=0.6
        (3, "alpha beta gamma delta"),     # J(1,3)=1.0
        (4, "zeta eta theta iota"),
        (5, "zeta eta theta iota kappa"),  # J(4,5)=4/5=0.8
        (6, "unrelated words entirely here"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in jaccard_pairs_prefix(df, "doc_id", "text", threshold=0.6).collect()
    }
    # brute force in python
    import itertools
    sets = {i: set(t.split()) for i, t in docs}
    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= 0.6:
            want[(a, b)] = round(j, 6)
    assert got == want and (1, 3) in got and (4, 5) in got


def test_jaccard_prefix_integer_threshold_boundary(spark):
    """t*n exactly integral in real arithmetic is the FP ceil trap:
    0.28*25 = 7.000000000000001 in IEEE doubles, so a bare ceil gives 8
    instead of 7 and the prefix ends one token short — silently losing
    exactly-at-threshold pairs whose shared tokens all sit in the tail
    of the document-frequency order. The epsilon nudge must keep them."""
    from dataframe_kotlin_spark.operators.dedup import jaccard_pairs_prefix

    # doc 1: 18 unique tokens (df=1, sort first) + 7 shared (df=2, tail);
    # doc 2: exactly the 7 shared tokens. J = 7/25 = 0.28 == t, and the
    # only prefix collision available to doc 1 is its 19th-ranked token
    # — present iff L = 25 - ceil(0.28*25) + 1 evaluates with ceil = 7.
    uniq = ["u%02d" % i for i in range(18)]
    shared = ["zz%d" % i for i in range(7)]
    docs = [
        (1, " ".join(uniq + shared)),
        (2, " ".join(shared)),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in jaccard_pairs_prefix(df, "doc_id", "text", threshold=0.28).collect()
    }
    assert got == {(1, 2): 0.28}


def test_chunk_text_coverage_properties(spark):
    """Every character covered exactly; overlap = size - stride; chunks
    reassemble the document."""
    from dataframe_kotlin_spark.operators.textpipe import chunk_text

    texts = ["x" * 1, "ab", "a" * 119, "b" * 120, "c" * 121, "d" * 500]
    df = spark.createDataFrame(
        [(i, "".join(chr(ord('a') + (i + j) % 26) for j in range(len(t)))) for i, t in enumerate(texts)],
        "doc_id int, text string",
    )
    orig = {r["doc_id"]: r["text"] for r in df.collect()}
    out = chunk_text(df, "text", size=120, stride=80, id_cols=["doc_id"])
    rows = sorted(
        ((r["doc_id"], r["chunk_id"], r["char_start"], r["chunk"]) for r in out.collect())
    )
    from collections import defaultdict
    per_doc = defaultdict(list)
    for d, cid, start, chunk in rows:
        per_doc[d].append((cid, start, chunk))
    for d, chunks in per_doc.items():
        text = orig[d]
        # chunk starts advance by stride; each chunk is the exact substring
        for cid, start, chunk in chunks:
            assert start == cid * 80
            assert chunk == text[start:start + 120]
        # reassembly from stride-aligned pieces covers the full text
        rebuilt = "".join(c[:80] for _, _, c in chunks[:-1]) + chunks[-1][2]
        assert rebuilt == text


def test_semdedup_prune_keeps_smallest_id(spark):
    from dataframe_kotlin_spark.operators.dedup import semdedup_prune

    rows = [
        # cluster 0: a(1) ~ b(2) identical, c(3) orthogonal
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [1.0, 0.0, 0.0]),
        (3, 0, [0.0, 1.0, 0.0]),
        # cluster 1: unit vectors at 0°/20°/40° — adjacent pairs at
        # cos20°≈0.94 (>0.9), the 4~6 pair at cos40°≈0.77 (<0.9)
        (4, 1, [1.0, 0.0, 0.0]),
        (5, 1, [0.93969262, 0.34202014, 0.0]),
        (6, 1, [0.76604444, 0.64278761, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, cell int, embedding array<double>")
    out = semdedup_prune(df, "cell", "embedding", "vec_id", threshold=0.9)
    got = sorted(r["vec_id"] for r in out.collect())
    # 2 dropped (dup of 1); 5 dropped (pair 4~5); 6 dropped (pair 5~6,
    # greedy-by-id even though 5 itself was dropped); 3 orthogonal survives
    assert got == [1, 3, 4]
    assert set(out.columns) == {"vec_id", "cell", "embedding"}


def test_semdedup_prune_cells_block_pairs(spark):
    from dataframe_kotlin_spark.operators.dedup import semdedup_prune

    # identical vectors in DIFFERENT cells are never compared
    rows = [(1, 0, [1.0, 0.0]), (2, 1, [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id int, cell int, embedding array<double>")
    out = semdedup_prune(df, "cell", "embedding", "vec_id", threshold=0.9)
    assert out.count() == 2


def test_decontaminate_drops_flagged_docs(spark):
    from dataframe_kotlin_spark.operators.textpipe import decontaminate, ngram_overlap_hits

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text with no overlap at all here"),
            (3, "short"),
        ],
        "doc_id int, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "we note the quick brown fox jumps high")], "doc_id int, text string"
    )
    hits = ngram_overlap_hits(corpus, evalset, n=5)
    assert {r["doc_id"] for r in hits.collect()} == {1}  # 5-gram 'the quick brown fox jumps'
    clean = decontaminate(corpus, evalset, n=5)
    assert sorted(r["doc_id"] for r in clean.collect()) == [2, 3]
    assert clean.columns == corpus.columns


def test_ngram_overlap_window_count_edges(spark):
    from dataframe_kotlin_spark.operators.textpipe import ngram_overlap_hits

    # doc shorter than n never explodes a window; exact-n doc has one
    corpus = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    evalset = spark.createDataFrame([(9, "a b c")], "doc_id int, text string")
    assert ngram_overlap_hits(corpus, evalset, n=4).count() == 0
    hits = ngram_overlap_hits(corpus, evalset, n=3).collect()
    assert [(r["doc_id"], r["n_hit_grams"]) for r in hits] == [(1, 1)]


def test_distribution_drift_detects_shift(spark):
    from dataframe_kotlin_spark.operators.quality import distribution_drift

    rows = [("ref", "a")] * 50 + [("ref", "b")] * 50
    rows += [("same", "a")] * 50 + [("same", "b")] * 50
    rows += [("shifted", "a")] * 90 + [("shifted", "b")] * 10
    rows += [("novel", "c")] * 100  # category unseen in ref
    df = spark.createDataFrame(rows, "slc string, v string")
    psi = {r["slc"]: r["psi"] for r in distribution_drift(df, "v", "slc", "ref").collect()}
    assert set(psi) == {"same", "shifted", "novel"}
    assert psi["same"] < 0.01
    assert psi["shifted"] > 0.25
    assert psi["novel"] > psi["shifted"]  # disjoint support drifts hardest
    assert all(v >= 0 for v in psi.values())  # PSI is non-negative


def test_mixture_plan_caps_and_deficit(spark):
    from dataframe_kotlin_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("wiki", 100), ("wiki", 100), ("crawl", 1000), ("junk", 50)],
        "src string, toks int",
    )
    out = {
        r["src"]: r
        for r in mixture_plan(
            df, "src", "toks", {"wiki": 0.5, "crawl": 0.5}, budget=1000, max_epochs=2.0
        ).collect()
    }
    # wiki: wants 500 but only 200 tokens * 2 epochs = 400 -> deficit 100
    assert out["wiki"]["allocated_tokens"] == 400.0
    assert out["wiki"]["epochs"] == 2.0
    assert out["wiki"]["deficit_tokens"] == 100.0
    # crawl: wants 500, has 1000 -> 0.5 epochs, no deficit
    assert out["crawl"]["allocated_tokens"] == 500.0
    assert out["crawl"]["epochs"] == 0.5
    # unweighted source reported but unallocated
    assert out["junk"]["allocated_tokens"] == 0.0


def test_distribution_drift_counts_null_category(spark):
    # a slice whose missing-value rate collapses is a MASSIVE shift and
    # must register: NULL folds into an explicit category, never dropped
    from dataframe_kotlin_spark.operators.quality import distribution_drift

    rows = [("ref", "a")] * 50 + [("ref", None)] * 50 + [("cur", "a")] * 100
    df = spark.createDataFrame(rows, "slc string, v string")
    psi = {r["slc"]: r["psi"] for r in distribution_drift(df, "v", "slc", "ref").collect()}
    assert psi["cur"] > 0.25  # half the reference mass vanished


def test_distribution_drift_null_slice_still_reported(spark):
    # a slice whose KEY went null must still get a PSI row (review fix)
    from dataframe_kotlin_spark.operators.quality import NULL_LABEL, distribution_drift

    rows = [(None, "a")] * 100 + [("ref", "a")] * 50 + [("ref", "b")] * 50
    df = spark.createDataFrame(rows, "slc string, v string")
    psi = {r["slc"]: r["psi"] for r in distribution_drift(df, "v", "slc", "ref").collect()}
    assert set(psi) == {NULL_LABEL}
    assert psi[NULL_LABEL] > 0.25  # 100% 'a' vs 50/50 is a real shift


def test_lsh_rejects_invalid_band_split(spark, docs=None):
    import pytest as _pytest

    from dataframe_kotlin_spark.operators.dedup import lsh_candidate_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="bands"):
        lsh_candidate_pairs(df, "doc_id", "text", num_hashes=4, bands=8)
    with _pytest.raises(ValueError, match="divide evenly"):
        lsh_candidate_pairs(df, "doc_id", "text", num_hashes=8, bands=3)


def test_chunk_pcm_null_and_empty_payloads_emit_no_rows(spark):
    from dataframe_kotlin_spark.operators.multimodal import chunk_pcm_audio

    df = spark.createDataFrame(
        [(1, bytearray(b"abcdefgh")), (2, None), (3, bytearray(b""))],
        "media_id long, payload binary",
    )
    out = chunk_pcm_audio(df, "media_id", "payload", sample_rate=2, bytes_per_sample=1, chunk_seconds=2.0)
    rows = out.collect()
    assert {r["media_id"] for r in rows} == {1}  # null/empty emit nothing
    assert len(rows) == 2  # ceil(8/4)


def test_sample_frames_lossless_tail(spark):
    from dataframe_kotlin_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [(1, bytearray(b"0123456789"))], "media_id long, payload binary"
    )
    out = sample_frames(df, n_frames=3).collect()
    frames = [bytes(r["frame"]) for r in sorted(out, key=lambda r: r["frame_idx"])]
    assert b"".join(frames) == b"0123456789"  # byte 9 no longer dropped


def test_resize_media_null_meta_row(spark):
    from dataframe_kotlin_spark.operators.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, bytearray(b"abc"), None)],
        "media_id long, payload binary, meta struct<mime:string,width:int,height:int>",
    )
    out = resize_media(df, 2, 2).collect()  # must not raise
    assert len(bytes(out[0]["payload"])) == 4


def test_hll_deterministic_null_values_dont_count(spark):
    from dataframe_kotlin_spark.operators.sketches import hll_deterministic

    rows = [("g", str(i)) for i in range(50)] + [("g", None)] * 50
    df = spark.createDataFrame(rows, "k string, v string")
    with_nulls = hll_deterministic(df, ["k"], "v").collect()[0]["hll_nd"]
    clean = hll_deterministic(
        spark.createDataFrame(rows[:50], "k string, v string"), ["k"], "v"
    ).collect()[0]["hll_nd"]
    assert with_nulls == clean  # NULLs contribute nothing


def test_hll_deterministic_all_null_group_reports_zero(spark):
    # count_distinct keeps an all-NULL group with 0; so do we (advice fix)
    from dataframe_kotlin_spark.operators.sketches import hll_deterministic

    rows = [("a", "x"), ("a", "y"), ("b", None), ("b", None), (None, "z")]
    df = spark.createDataFrame(rows, "k string, v string")
    out = {r["k"]: r["hll_nd"] for r in hll_deterministic(df, ["k"], "v").collect()}
    assert set(out) == {"a", "b", None}  # every group present, incl. NULL key
    assert out["b"] == 0.0
    assert out["a"] > 0.0 and out[None] > 0.0


def test_mixture_plan_missing_source_reports_full_deficit(spark):
    # a weighted source absent from the corpus must surface as deficit,
    # not silently vanish from the plan (advice fix: full outer join)
    from dataframe_kotlin_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame([("crawl", 1000)], "src string, toks int")
    out = {
        r["src"]: r
        for r in mixture_plan(
            df, "src", "toks", {"crawl": 0.5, "books": 0.5}, budget=1000
        ).collect()
    }
    assert set(out) == {"crawl", "books"}
    assert out["books"]["available_tokens"] == 0.0
    assert out["books"]["requested_tokens"] == 500.0
    assert out["books"]["allocated_tokens"] == 0.0
    assert out["books"]["deficit_tokens"] == 500.0
    assert out["books"]["epochs"] == 0.0


def test_dsir_null_text_doc_gets_zero_weight(spark):
    # contract: (id, log_weight) for EVERY raw document — feature-less
    # (NULL text) docs carry the empty-product weight 0.0 (advice fix)
    from dataframe_kotlin_spark.operators.sampling import dsir_log_weights

    raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, None), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    target = raw.filter("doc_id = 1")
    out = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(raw, target).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2] == 0.0


def test_psi_check_raises_on_missing_reference_slice(spark):
    import pytest as _pytest

    from dataframe_kotlin_spark.operators.quality import NULL_LABEL, psi_check

    rows = [("ref", "a")] * 5 + [("cur", "b")] * 5 + [(None, "a")] * 5
    df = spark.createDataFrame(rows, "slc string, v string")
    with _pytest.raises(ValueError, match="matches no"):
        psi_check(df, "v", "slc", "tpyo")
    with _pytest.raises(ValueError, match="NULL_LABEL"):
        psi_check(df, "v", "slc", None)  # lit(None) never compares equal
    # the NULL slice is addressable via the reserved label
    psi = {r["slc"]: r["psi"] for r in psi_check(df, "v", "slc", NULL_LABEL).collect()}
    assert set(psi) == {"ref", "cur"}


def test_digitize_null_and_empty_bins(spark):
    from dataframe_kotlin_spark.functions.math import digitize

    df = spark.createDataFrame([(5.0,), (None,), (20.0,)], "x double")
    out = df.select(digitize(F.col("x"), [1.0, 10.0]).alias("b")).collect()
    got = [r["b"] for r in out]
    assert got == [1, None, 2]  # NULL stays NULL, not the overflow bin
    empty = df.select(digitize(F.col("x"), []).alias("b")).collect()
    assert [r["b"] for r in empty] == [0, None, 0]  # numpy parity


def test_winsorize_standardize_keep_null_key_rows(spark):
    from dataframe_kotlin_spark.operators.features import standardize, winsorize

    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("a", 3.0), (None, 4.0)], "g string, x double"
    )
    w = winsorize(df, ["x"], keys=["g"], lower=0.0, upper=1.0)
    assert w.count() == 4  # NULL-key rows clipped within their own group
    z = standardize(df, ["x"], keys=["g"])
    assert z.count() == 4
    nulls = {r["x"]: r["x_z"] for r in z.collect() if r["g"] is None}
    assert abs(nulls[4.0] - 0.7071067811865475) < 1e-9  # z within the NULL group


def test_hyperplane_lsh_pinned_buckets(spark):
    """Pin exact bucket ids: the r7 driver-side sign precompute must stay
    bit-identical to the original in-plan md5-parity form (same recipe,
    same fold order) — these values were produced by the r6 expression."""
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [0.5, -0.25, 4.0]), (2, [-3.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = similarity.hyperplane_lsh_buckets(df, "embedding", dim=3, n_planes=8, seed=42)
    got = {r["vec_id"]: r["lsh_bucket"] for r in out.collect()}
    # reference values computed with the pre-r7 in-plan expression
    import hashlib

    def ref_bucket(vec):
        b = 0
        for p in range(8):
            proj = 0.0
            for i, x in enumerate(vec):
                h = hashlib.md5(f"42_{p}_{i}".encode()).hexdigest()
                proj += x * (1.0 if int(h[:4], 16) % 2 == 1 else -1.0)
            if proj > 0:
                b += 2**p
        return b

    assert got == {0: ref_bucket([1.0, 2.0, 3.0]), 1: ref_bucket([0.5, -0.25, 4.0]), 2: ref_bucket([-3.0, 0.0, 1.0])}


def test_simhash_numpy_matches_expr_bitexact(spark):
    """The r7 Arrow-batched simhash fold is exact integer math, so unlike
    the dgemm float switch the two paths must agree on EVERY input —
    including NULL/empty text (expression folds NULL to signature 0)."""
    from dataframe_kotlin_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b a"), (4, "the quick brown fox " * 9)],
        "doc_id int, text string",
    )
    small = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    for frame in (df, small):
        a = {r["doc_id"]: r["simhash"] for r in simhash(frame, "text", bits=12, method="expr").select("doc_id", "simhash").collect()}
        b = {r["doc_id"]: r["simhash"] for r in simhash(frame, "text", bits=12, method="numpy").select("doc_id", "simhash").collect()}
        assert a == b


def test_simhash64_paths_bitexact_and_negative(spark):
    """64-bit simhash (the deployment width, r8): hash64 word hashes put
    bit 63 in the bigint sign bit, so signatures go NEGATIVE — the expr
    fold (sign-safe shift+mask, two's-complement weight for j=63) and
    the numpy int64-wrap fold must still agree bit-for-bit on every
    input, including NULL/empty text."""
    from dataframe_kotlin_spark.operators.dedup import simhash

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b a"), (4, "the quick brown fox " * 9)],
        "doc_id int, text string",
    )
    small = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    saw_negative = False
    for frame in (df, small):
        a = {r["doc_id"]: r["simhash"] for r in simhash(frame, "text", bits=64, method="expr").select("doc_id", "simhash").collect()}
        b = {r["doc_id"]: r["simhash"] for r in simhash(frame, "text", bits=64, method="numpy").select("doc_id", "simhash").collect()}
        assert a == b
        saw_negative = saw_negative or any(v < 0 for v in a.values())
    assert saw_negative  # the sign bit is genuinely exercised
    with pytest.raises(ValueError, match="bits"):
        simhash(df, "text", bits=65)


def test_hamming_pairs_sign_safe_blocks_full_recall(spark):
    """hamming_pairs block keys must be sign-safe: with 64-bit (negative)
    signatures the old `shiftright % 2^w` key misread negative shifted
    values (Java % keeps the dividend's sign), silently losing recall.
    Banded pairs must equal brute force on a corpus with negative sigs."""
    import itertools

    from dataframe_kotlin_spark.operators.dedup import hamming_pairs, simhash

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    sigs = simhash(docs, "text", bits=64)
    vals = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert any(v < 0 for v in vals.values())
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(sigs, "doc_id", "simhash", max_dist=3, bits=64).collect()
    )
    mask = (1 << 64) - 1
    brute = sorted(
        (a, b, bin((vals[a] ^ vals[b]) & mask).count("1"))
        for a, b in itertools.combinations(sorted(vals), 2)
        if bin((vals[a] ^ vals[b]) & mask).count("1") <= 3
    )
    assert got == brute and len(got) > 0


def test_semdedup_scaled_registry_contract(spark):
    """The scale-posture SemDeDup registry query (r8): one row of
    corpus-level facts, every boolean TRUE, deterministic re-run."""
    from dataframe_kotlin_spark.queries.pipeline import semdedup_scaled

    rows = semdedup_scaled(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_total"] == 500
    assert r["partition_ok"] and r["prune_sound"]
    assert r["prune_complete"] and r["no_dup_survivors"]


def test_dedup_then_jaccard_composes(spark):
    """dedup_then_jaccard (r8): exact-dup classes collapse BEFORE pair
    enumeration — no surviving pair may be an exact normalized-text
    copy, and every surviving doc is its class's smallest id."""
    from dataframe_kotlin_spark.queries.pipeline import dedup_then_jaccard
    from dataframe_kotlin_spark.functions.text import normalize

    out = dedup_then_jaccard(spark, "/root/testdata/sf0.001")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    norm = {r["doc_id"]: r["n"] for r in docs.select("doc_id", normalize(F.col("text")).alias("n")).collect()}
    keep = {}
    for d, n in norm.items():
        keep[n] = min(keep.get(n, d), d)
    kept_ids = set(keep.values())
    pairs = out.collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r["id_a"] in kept_ids and r["id_b"] in kept_ids
        assert norm[r["id_a"]] != norm[r["id_b"]]  # exact copies never survive
        assert r["jaccard"] >= 0.9


def test_jaccard_prefix_randomized_recall_with_ppjoin_filters(spark):
    """Randomized corpus vs brute force at two thresholds: the r10
    length + positional (PPJoin) candidate filters must stay EXACT —
    full recall, identical pair sets and values — across many sizes,
    overlap structures, and at-threshold boundaries."""
    import itertools
    import random

    from dataframe_kotlin_spark.operators.dedup import jaccard_pairs_prefix

    rng = random.Random(11)
    vocab = ["w%02d" % i for i in range(40)]
    docs = []
    for i in range(36):
        n = rng.randint(2, 14)
        docs.append((i, " ".join(rng.sample(vocab, n))))
    # seed exact duplicates and near-boundary pairs deliberately
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1] + " extraone"))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    sets = {i: set(t.split()) for i, t in docs}
    for t in (0.5, 0.75):
        got = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in jaccard_pairs_prefix(df, "doc_id", "text", threshold=t).collect()
        }
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            if j >= t:
                want[(a, b)] = round(j, 9)
        assert got == want, (t, set(want) ^ set(got))


# ---- r11: duplicated-span detection + winnowing fingerprints ---------------


def test_duplicate_spans_exact_vs_bruteforce(docs):
    """Width-n span detection is EXACT: compare against a pure-python
    sliding-window count over the same normalized tokens."""
    rows = {r["doc_id"]: r["text"].lower().split() for r in docs.collect()}
    n = 4
    from collections import defaultdict

    by_span = defaultdict(lambda: [set(), 0])
    for d, t in rows.items():
        for i in range(len(t) - n + 1):
            s = " ".join(t[i : i + n])
            by_span[s][0].add(d)
            by_span[s][1] += 1
    want = {
        s: (len(ds), occ) for s, (ds, occ) in by_span.items() if len(ds) >= 2
    }
    got = {
        r["span"]: (r["n_docs"], r["n_occurrences"])
        for r in dedup.duplicate_spans(docs, span_tokens=n).collect()
    }
    assert got == want
    # the hash-key path finds the same spans (keys are hash64 of them)
    got_h = {
        r["span_hash"]: (r["n_docs"], r["n_occurrences"])
        for r in dedup.duplicate_spans(docs, span_tokens=n, key="hash").collect()
    }
    assert sorted(got_h.values()) == sorted(want.values())


def test_span_dup_fraction_bounds_and_exact_dup(docs):
    out = {
        r["doc_id"]: r
        for r in dedup.span_dup_fraction(docs, span_tokens=4).collect()
    }
    # exact duplicates 0 and 1: every window duplicated
    assert out[0]["dup_fraction"] == 1.0 and out[1]["dup_fraction"] == 1.0
    # all fractions in [0, 1]; window counts positive
    for r in out.values():
        assert 0.0 <= r["dup_fraction"] <= 1.0
        assert r["n_windows"] >= 1 and 0 <= r["n_dup"] <= r["n_windows"]
    # docs 3 and 4 share the word SET but no 4-token run: no dup windows
    assert out[3]["n_dup"] == 0 and out[4]["n_dup"] == 0


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Schleimer et al.'s guarantee, value form: two documents sharing a
    verbatim run of >= n + w - 1 tokens MUST share a selected
    fingerprint (n=4, w=3 -> run of 6 suffices), under any surrounding
    junk."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = n + w - 1
    df = spark.createDataFrame(
        [
            (0, f"one two three {shared} four five six"),
            (1, f"nine eight {shared} seven"),
            (2, "entirely unrelated words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    fp = dedup.winnow_fingerprints(df, n=4, w=3)
    sets = {
        d: {r["fingerprint"] for r in fp.filter(F.col("doc_id") == d).collect()}
        for d in (0, 1, 2)
    }
    assert sets[0] & sets[1], "shared 6-token run must share a fingerprint"
    assert not (sets[0] & sets[2]) and not (sets[1] & sets[2])


def test_winnow_density_below_full_explosion(spark):
    """Winnowing selects strictly fewer fingerprints than the full
    window explosion (the point of the op), and every selected value IS
    one of the document's window hashes."""
    text = " ".join(f"tok{i % 17}" for i in range(300))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    n, w = 8, 4
    fp = {r["fingerprint"] for r in dedup.winnow_fingerprints(df, n=n, w=w).collect()}
    allh = {
        r["h"]
        for r in dedup._span_windows(df, "doc_id", "text", n)
        .select(dedup.hash64(F.col("__span__")).alias("h"))
        .collect()
    }
    assert fp <= allh
    # density ~2/(w+1) of distinct windows; allow generous slack upward
    assert 0 < len(fp) <= len(allh)
    assert len(fp) < 0.9 * len(allh)


def test_excise_duplicate_spans_keep_one(spark):
    """Keep-one semantics: the smallest doc_id containing a duplicated
    span keeps it; every other document excises exactly the covered
    tokens (union of overlapping windows); untouched docs pass through
    as normalized text."""
    df = spark.createDataFrame(
        [
            (0, "The quick  brown fox jumps over the lazy dog"),
            (1, "intro words the quick brown fox jumps over the lazy dog outro"),
            (2, "unrelated content entirely here with many words to see"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in dedup.excise_duplicate_spans(df, span_tokens=4, min_docs=2).collect()
    }
    # keeper (doc 0) keeps its text — normalized (lowercase, collapsed ws)
    assert out[0] == "the quick brown fox jumps over the lazy dog"
    # doc 1 loses the whole shared run (overlapping 4-windows merged)
    assert out[1] == "intro words outro"
    assert out[2] == "unrelated content entirely here with many words to see"
    # exact duplicate pair: the non-keeper empties entirely
    dd = spark.createDataFrame(
        [(7, "a b c d e f"), (9, "a b c d e f")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["text_deduped"]
        for r in dedup.excise_duplicate_spans(dd, span_tokens=4, min_docs=2).collect()
    }
    assert got == {7: "a b c d e f", 9: ""}


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    docs_toks=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=24),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=2, max_value=5),
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_duplicate_spans_property_vs_bruteforce(spark, docs_toks, n):
    """Property: duplicate_spans == the brute-force sliding-window count
    on arbitrary token sequences (single-char tokens so duplicated runs
    occur often), including degenerate docs (< n tokens, repeated
    tokens, all-equal docs)."""
    from collections import defaultdict

    rows = [(i, " ".join(t)) for i, t in enumerate(docs_toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    by_span = defaultdict(lambda: [set(), 0])
    for i, t in enumerate(docs_toks):
        # mirror the tokenizer quirk: split('') of an empty doc is ['']
        toks = " ".join(t).split(" ") if t else [""]
        for j in range(len(toks) - n + 1):
            s = " ".join(toks[j : j + n])
            by_span[s][0].add(i)
            by_span[s][1] += 1
    want = {s: (len(d), c) for s, (d, c) in by_span.items() if len(d) >= 2}
    got = {
        r["span"]: (r["n_docs"], r["n_occurrences"])
        for r in dedup.duplicate_spans(df, span_tokens=n).collect()
    }
    assert got == want
    # excision: full positional semantics vs brute force — a token
    # survives in doc D iff NO duplicated-span occurrence whose keeper
    # is another doc covers it. (A naive "keeper still contains the
    # span" invariant is FALSE when two different duplicated spans
    # overlap: hypothesis found d1 = "a a a a e d" keeping span "a e"
    # but losing its 'a' to the overlapping "a a" span kept by d0.)
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in dedup.excise_duplicate_spans(df, span_tokens=n).collect()
    }
    for i, t in enumerate(docs_toks):
        toks = " ".join(t).split(" ") if t else [""]
        covered = set()
        for j in range(len(toks) - n + 1):
            s = " ".join(toks[j : j + n])
            d = by_span[s][0]
            if len(d) >= 2 and min(d) != i:
                covered.update(range(j, j + n))
        kept = [toks[j] for j in range(len(toks)) if j not in covered]
        assert out[i] == " ".join(kept), (i, out[i], kept)


# ---- r12: winnowed candidate pipeline (VERDICT r11 item 1) -----------------


def test_winnow_candidate_pairs_recall_and_verify(spark):
    """End-to-end pipeline contract: a pair sharing a verbatim run of
    >= n + w - 1 tokens MUST surface as a candidate AND survive the
    targeted verify with the exact shared-window count; disjoint docs
    never pair."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = n + w - 1 (n=4, w=3)
    df = spark.createDataFrame(
        [
            (0, f"one two three {shared} four five six"),
            (1, f"nine eight {shared} seven"),
            (2, "entirely unrelated words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    cand = {
        (r["id_a"], r["id_b"])
        for r in dedup.winnow_candidate_pairs(df, n=4, w=3).collect()
    }
    assert (0, 1) in cand
    assert not any(2 in p for p in cand)
    got = {
        (r["id_a"], r["id_b"]): r["n_shared_spans"]
        for r in dedup.winnowed_duplicate_pairs(df, n=4, w=3).collect()
    }
    # the shared 6-token run contributes exactly 3 distinct 4-windows
    assert got == {(0, 1): 3}


@given(
    docs_toks=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=20),
        min_size=2,
        max_size=6,
    ),
    nw=st.tuples(st.integers(2, 4), st.integers(2, 4)),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_winnowed_pairs_property_vs_bruteforce(spark, docs_toks, nw):
    """Property (both directions of the pipeline contract):
    - soundness: every emitted pair's n_shared_spans equals the brute
      force count of DISTINCT shared n-windows (and is >= 1);
    - recall: any pair sharing a verbatim run of >= n + w - 1 tokens is
      emitted (the winnowing theorem survives the composition)."""
    n, w = nw
    rows = [(i, " ".join(t)) for i, t in enumerate(docs_toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = {}
    for i, t in enumerate(docs_toks):
        toks[i] = " ".join(t).split(" ") if t else [""]
    wins = {
        i: {" ".join(t[j : j + n]) for j in range(len(t) - n + 1)}
        for i, t in toks.items()
    }
    got = {
        (r["id_a"], r["id_b"]): r["n_shared_spans"]
        for r in dedup.winnowed_duplicate_pairs(df, n=n, w=w).collect()
    }
    for (a, b), c in got.items():
        assert c == len(wins[a] & wins[b]) and c >= 1, (a, b)

    def longest_shared_run(a, b):
        best = 0
        ta, tb = toks[a], toks[b]
        for i in range(len(ta)):
            for j in range(len(tb)):
                k = 0
                while i + k < len(ta) and j + k < len(tb) and ta[i + k] == tb[j + k]:
                    k += 1
                best = max(best, k)
        return best

    for a in toks:
        for b in toks:
            if a < b and longest_shared_run(a, b) >= n + w - 1:
                assert (a, b) in got, (a, b)


def test_span_dup_fraction_include_short(spark):
    """include_short=True materializes the 'missing means 0' contract:
    sub-span_tokens documents appear as (id, 0, 0, 0.0); the default
    omits them (r11 contract unchanged)."""
    df = spark.createDataFrame(
        [
            (0, "a b c d e f"),
            (1, "a b c d e f"),
            (2, "xy"),  # 1 token < span_tokens
        ],
        "doc_id long, text string",
    )
    dflt = {r["doc_id"] for r in dedup.span_dup_fraction(df, span_tokens=4).collect()}
    assert dflt == {0, 1}
    full = {
        r["doc_id"]: (r["n_windows"], r["n_dup"], r["dup_fraction"])
        for r in dedup.span_dup_fraction(df, span_tokens=4, include_short=True).collect()
    }
    assert full[2] == (0, 0, 0.0)
    assert full[0] == (3, 3, 1.0) and full[1] == (3, 3, 1.0)


def test_longest_duplicate_run_hand_cases(spark):
    """Run semantics pinned by hand (r12): a maximal run of consecutive
    duplicated window starts i..j reports (j - i) + n tokens; scattered
    duplicated windows report n; clean and sub-n docs report 0 and
    still emit a row; the hash shuffle-key posture agrees with text."""
    boiler = "l1 l2 l3 l4 l5 l6"  # 6-token block, n=4 -> 3 windows, run = 6
    df = spark.createDataFrame(
        [
            (0, f"u0a u0b {boiler} u0c"),
            (1, f"u1a {boiler} u1b u1c"),
            # doc 2 shares ONLY the scattered 4-window "s1 s2 s3 s4"
            # with doc 3 (one duplicated start each -> run = n = 4)
            (2, "s1 s2 s3 s4 zz1 zz2 zz3 zz4 zz5"),
            (3, "yy1 yy2 s1 s2 s3 s4 yy3 yy4"),
            (4, "entirely clean words never repeated anywhere else one"),
            (5, "shorty"),  # < n tokens
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["longest_dup_run"])
        for r in dedup.longest_duplicate_run(df, span_tokens=4).collect()
    }
    assert got[0] == (6, 6) and got[1] == (6, 6)
    assert got[2] == (6, 4) and got[3] == (5, 4)
    assert got[4] == (5, 0)
    assert got[5] == (0, 0)
    hashed = {
        r["doc_id"]: (r["n_windows"], r["longest_dup_run"])
        for r in dedup.longest_duplicate_run(df, span_tokens=4, key="hash").collect()
    }
    assert hashed == got


@given(
    docs_toks=st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=16),
        min_size=2,
        max_size=5,
    ),
    n=st.integers(2, 4),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_longest_duplicate_run_property_vs_bruteforce(spark, docs_toks, n):
    """Property: longest_dup_run equals the brute-force longest
    contiguous block of starts whose n-window appears in >= 2 distinct
    docs, plus n-1 — for every doc, including 0 rows."""
    rows = [(i, " ".join(t)) for i, t in enumerate(docs_toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = {i: (" ".join(t).split(" ") if t else [""]) for i, t in enumerate(docs_toks)}
    by_span = {}
    for i, t in toks.items():
        for j in range(len(t) - n + 1):
            by_span.setdefault(" ".join(t[j : j + n]), set()).add(i)
    want = {}
    for i, t in toks.items():
        nw = max(len(t) - n + 1, 0)
        best = cur = 0
        for j in range(nw):
            if len(by_span[" ".join(t[j : j + n])]) >= 2:
                cur += 1
                best = max(best, cur)
            else:
                cur = 0
        want[i] = (nw, best + n - 1 if best else 0)
    got = {
        r["doc_id"]: (r["n_windows"], r["longest_dup_run"])
        for r in dedup.longest_duplicate_run(df, span_tokens=n).collect()
    }
    assert got == want


# ---- r12: incremental store-based dedup -----------------------------------


def test_incremental_new_docs_and_span_store(spark):
    """The crawl-ingest contract: a batch doc textually identical to a
    history doc (modulo normalization) is dropped by the fingerprint
    anti-join; novel docs survive with all columns; the span store is
    the distinct window-key set and both key layouts agree in size."""
    hist = spark.createDataFrame(
        [(0, "The Quick   brown fox jumps over the lazy dog"),
         (2, "entirely different historical content here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),  # dup of 0
         (3, "genuinely new text never seen before at all"),
         (5, "entirely different historical content here")],  # dup of 2
        "doc_id long, text string",
    )
    store = dedup.exact_dedup(hist, "text", "doc_id").select("fingerprint")
    out = dedup.incremental_new_docs(batch, store, "doc_id", "text")
    assert sorted(r["doc_id"] for r in out.collect()) == [3]
    assert out.columns == ["doc_id", "text"]
    st_t = dedup.span_store(hist, "text", span_tokens=4, key="text")
    st_h = dedup.span_store(hist, "text", span_tokens=4, key="hash")
    assert st_t.columns == ["span"] and st_h.columns == ["span_hash"]
    assert st_t.count() == st_h.count() > 0


def test_incremental_span_contamination_fractions(spark):
    """Hand-pinned fractions: a batch doc sharing half its distinct
    windows with history reports 0.5; an all-new doc 0.0; an identical
    doc 1.0; a sub-n doc emits (0, 0, 0.0)."""
    hist = spark.createDataFrame(
        [(0, "h1 h2 h3 h4 h5")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (1, "h1 h2 h3 h4 h5"),        # identical: 2 windows, both seen
            (3, "h1 h2 h3 h4 b1"),        # windows {h1..h4, h2..b1}: 1 of 2 seen
            (5, "n1 n2 n3 n4 n5 n6"),     # all new
            (7, "tiny doc"),              # < 4 tokens
        ],
        "doc_id long, text string",
    )
    for key in ("text", "hash"):
        store = dedup.span_store(hist, "text", span_tokens=4, key=key)
        got = {
            r["doc_id"]: (r["n_windows"], r["n_seen"], r["seen_fraction"])
            for r in dedup.incremental_span_contamination(
                batch, store, "doc_id", "text", span_tokens=4, key=key
            ).collect()
        }
        assert got[1] == (2, 2, 1.0), key
        assert got[3] == (2, 1, 0.5), key
        assert got[5] == (3, 0, 0.0), key
        assert got[7] == (0, 0, 0.0), key


@given(
    hist_toks=st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=10),
        min_size=1, max_size=4,
    ),
    batch_toks=st.lists(
        st.lists(st.sampled_from("abc"), min_size=0, max_size=10),
        min_size=1, max_size=4,
    ),
    n=st.integers(2, 4),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_incremental_ops_property_vs_bruteforce(spark, hist_toks, batch_toks, n):
    """Property: incremental_new_docs == batch docs whose normalized
    text is not in history; span contamination fractions match the
    brute-force distinct-window containment for every batch doc."""
    hist = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(hist_toks)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1000 + i, " ".join(t)) for i, t in enumerate(batch_toks)],
        "doc_id long, text string",
    )
    fstore = dedup.exact_dedup(hist, "text", "doc_id").select("fingerprint")
    got_new = sorted(
        r["doc_id"]
        for r in dedup.incremental_new_docs(batch, fstore, "doc_id", "text").collect()
    )
    hist_norm = {" ".join(t) for t in hist_toks}
    want_new = sorted(
        1000 + i for i, t in enumerate(batch_toks) if " ".join(t) not in hist_norm
    )
    assert got_new == want_new

    sstore = dedup.span_store(hist, "text", span_tokens=n, key="hash")
    got = {
        r["doc_id"]: (r["n_windows"], r["n_seen"])
        for r in dedup.incremental_span_contamination(
            batch, sstore, "doc_id", "text", span_tokens=n, key="hash"
        ).collect()
    }
    hwins = set()
    for t in hist_toks:
        tt = " ".join(t).split(" ") if t else [""]
        for j in range(len(tt) - n + 1):
            hwins.add(" ".join(tt[j : j + n]))
    for i, t in enumerate(batch_toks):
        tt = " ".join(t).split(" ") if t else [""]
        bw = {" ".join(tt[j : j + n]) for j in range(len(tt) - n + 1)}
        assert got[1000 + i] == (len(bw), len(bw & hwins)), (i, t)


def test_r12_replay_persists_engage(spark):
    """r12 optimization pins: the shared relations that used to replay
    their build subtrees into every consumer (jaccard's ranked prefix,
    the winnow verify's candidate pairs + candidate-doc spans) are now
    persisted, so each expensive subtree executes once per run. Assert
    the physical plan consumes a cached relation (InMemoryTableScan)
    AND that results are byte-identical to the unpersisted brute force
    (the recall tests above already pin values; this pins the plan)."""
    from dataframe_kotlin_spark.operators.dedup import (
        jaccard_pairs_prefix,
        winnowed_duplicate_pairs,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota lam"),
        (3, "one two three four five six seven eight nine ten"),
        (4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")

    jp = jaccard_pairs_prefix(df, "doc_id", "text", threshold=0.6)
    jp_plan = jp._jdf.queryExecution().executedPlan().toString()
    # base + prefix both cached -> at least two distinct InMemory scans
    assert jp_plan.count("InMemoryTableScan") >= 2
    assert {(r["id_a"], r["id_b"]) for r in jp.collect()} == {(1, 2), (1, 4), (2, 4)}

    wp = winnowed_duplicate_pairs(df, "doc_id", "text", n=8, w=2)
    wp_plan = wp._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in wp_plan
    got = {(r["id_a"], r["id_b"]): r["n_shared_spans"] for r in wp.collect()}
    # docs 1 and 4 are identical (3 distinct 8-token windows shared);
    # 1-2 and 2-4 share the 9-token prefix run -> two 8-windows
    assert got[(1, 4)] == 3 and got[(1, 2)] == 2 and got[(2, 4)] == 2


def test_cosine_pairs_salted_identical(spark):
    """r12: salt_parts splits the few-big-cells pair space across tasks
    (the r8 fan-out trap hit the expr path's cell shuffle); the pair
    SET and every per-pair fold must be value-identical — each pair
    meets exactly once, at the a-row's salt."""
    import random

    from dataframe_kotlin_spark.operators.similarity import cosine_neardup_pairs

    rnd = random.Random(7)
    rows = [
        (i, i % 3, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "vec_id int, label int, embedding array<double>")
    plain = {
        (r["id_a"], r["id_b"], r["cell"], r["cosine_sim"])
        for r in cosine_neardup_pairs(df, "label", threshold=0.1).collect()
    }
    salted = {
        (r["id_a"], r["id_b"], r["cell"], r["cosine_sim"])
        for r in cosine_neardup_pairs(df, "label", threshold=0.1, salt_parts=8).collect()
    }
    assert plain == salted and len(plain) > 0


def test_r13_selfjoin_probe_persists_engage(spark):
    """r13 optimization pins: lsh_candidate_pairs / hamming_pairs /
    levenshtein_pairs persist the pinned probe relation BOTH self-join
    sides consume — without the persist the whole signature subtree
    (tokenize + per-token md5 + minhash folds, the simhash Arrow fold,
    the 37-replace histogram) executed twice per run (plans/r13/
    *_before.txt). Assert each physical plan consumes a cached relation
    (InMemoryTableScan) and that values are unchanged."""
    from dataframe_kotlin_spark.operators.dedup import (
        hamming_pairs,
        levenshtein_pairs,
        lsh_candidate_pairs,
        simhash,
    )

    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")

    lp = lsh_candidate_pairs(df, "doc_id", "text", num_hashes=8, bands=4)
    assert "InMemoryTableScan" in lp._jdf.queryExecution().executedPlan().toString()
    assert {(r["id_a"], r["id_b"]) for r in lp.collect()} == {(1, 2)}

    sigs = simhash(df, "text", bits=12, keep_cols=["doc_id"])
    hp = hamming_pairs(sigs, "doc_id", "simhash", max_dist=2, bits=12)
    assert "InMemoryTableScan" in hp._jdf.queryExecution().executedPlan().toString()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in hp.collect()} == {(1, 2, 0)}

    lv = levenshtein_pairs(
        df.withColumn("blk", F.lit("x")), "doc_id", "text", ["blk"], max_dist=5
    )
    assert "InMemoryTableScan" in lv._jdf.queryExecution().executedPlan().toString()
    assert {(r["id_a"], r["id_b"], r["edit_distance"]) for r in lv.collect()} == {(1, 2, 0)}


def test_r13_simhash_keep_cols_identical_and_pruned(spark):
    """r13 guide-§4 column pruning: simhash(keep_cols=[id]) must ship
    only (id, hash array) across the Arrow boundary and return exactly
    keep_cols + out_col, with signatures identical to the default
    all-columns form on BOTH the numpy and expr paths."""
    from dataframe_kotlin_spark.operators.dedup import simhash

    docs = [
        (1, "alpha beta gamma", "en", 17),
        (2, "delta epsilon", "de", 13),
        (3, None, "fr", 0),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string, lang string, n int")
    for method in ("numpy", "expr"):
        full = {
            (r["doc_id"], r["simhash"])
            for r in simhash(df, "text", bits=16, method=method).collect()
        }
        pruned_df = simhash(df, "text", bits=16, method=method, keep_cols=["doc_id"])
        assert pruned_df.columns == ["doc_id", "simhash"]
        pruned = {(r["doc_id"], r["simhash"]) for r in pruned_df.collect()}
        assert full == pruned and len(full) == 3
    # the pruned numpy plan's Python boundary must not carry the other
    # input columns (lang/n/text) — only the id and the hash array
    plan = (
        simhash(df, "text", bits=16, method="numpy", keep_cols=["doc_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    map_line = next(l for l in plan.splitlines() if "MapInPandas" in l)
    assert "lang" not in map_line and "text" not in map_line, map_line


def test_r13_auto_salt_parts_sizing(spark):
    """r13 (VERDICT r12 item 5): salt_parts='auto' sizes S from the
    observed largest cell's pair space with bounded replication — and
    the salted-auto pair set stays identical to the unsalted one."""
    import random

    from dataframe_kotlin_spark.operators.similarity import (
        _auto_salt_parts,
        cosine_neardup_pairs,
    )

    rnd = random.Random(11)
    rows = [(i, i % 2, [rnd.uniform(-1, 1) for _ in range(6)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id int, label int, embedding array<double>")
    # largest cell = 25 rows -> 300 pairs: fits one target unit -> S=1
    assert _auto_salt_parts(df, "label", target_pairs=4096) == 1
    # force tiny units: 300 pairs / 50-pair units -> S=6; cap binds at 4
    assert _auto_salt_parts(df, "label", target_pairs=50) == 6
    assert _auto_salt_parts(df, "label", target_pairs=50, cap=4) == 4
    plain = {
        (r["id_a"], r["id_b"], r["cell"], r["cosine_sim"])
        for r in cosine_neardup_pairs(df, "label", threshold=0.05).collect()
    }
    auto = {
        (r["id_a"], r["id_b"], r["cell"], r["cosine_sim"])
        for r in cosine_neardup_pairs(
            df, "label", threshold=0.05, salt_parts="auto"
        ).collect()
    }
    assert plain == auto and len(plain) > 0
