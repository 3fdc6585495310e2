"""Training-data ops tests: dedup family, text analysis, ANN,
multimodal plumbing (SURVEY.md extension tier)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tripleforge import ann, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_finds_planted_dups(spark):
    df = spark.createDataFrame(
        [(1, "same  TEXT here"), (2, "same text  HERE"), (3, "different")],
        "doc_id long, text string",
    )
    out = {r.representative: r.n_dups for r in text.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}  # normalization collapses case/whitespace


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "a b  c"), (2, "x,y 12z")], "doc_id long, text string")
    rows = {
        r.doc_id: (r.nt, r.ns)
        for r in df.select(
            "doc_id",
            text.token_count(F.col("text")).alias("nt"),
            text.bpe_ish_token_count(F.col("text")).alias("ns"),
        ).collect()
    }
    assert rows[1] == (3, 3)
    assert rows[2] == (2, 5)  # x , y 12 z


def test_shingles_and_jaccard(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely unrelated words appear in this document"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in text.jaccard_pairs(df, k=3, threshold=0.1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_near_dups(spark):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 3
    df = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "zeta eta theta iota kappa " * 6)],
        "doc_id long, text string",
    )
    cand = {(r.doc_a, r.doc_b) for r in text.minhash_lsh_pairs(df, verify_threshold=None).collect()}
    assert (1, 2) in cand
    assert (1, 3) not in cand and (2, 3) not in cand


def test_simhash_near_dup(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten " * 4),
            (2, "one two three four five six seven eight nine zzz " * 4),
            (3, "red orange yellow green blue indigo violet pink black white " * 4),
        ],
        "doc_id long, text string",
    )
    sh = {r.doc_id: r.s for r in df.select("doc_id", text.simhash(F.col("text")).alias("s")).collect()}
    assert all(len(s) == 64 and set(s) <= {"0", "1"} for s in sh.values())
    d12 = sum(a != b for a, b in zip(sh[1], sh[2]))
    d13 = sum(a != b for a, b in zip(sh[1], sh[3]))
    assert d12 < d13  # near-dup closer in hamming space


def test_langid(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and of course"),
            (2, "der Hund ist nicht und das Haus"),
            (3, "le chat est dans la maison et les arbres"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang for r in df.select("doc_id", text.langid(F.col("text")).alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_quality_score_range(docs):
    vals = [r.q for r in docs.select(text.quality_score(F.col("text")).alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_ann_bruteforce_exact(spark, emb):
    """Spark two-phase top-k == naive numpy top-k."""
    import numpy as np

    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    got = ann.cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append((r.rnk, r.nid))
    for qid in (0, 1, 2):
        qi = int(np.where(ids == qid)[0][0])
        sims = (mat @ mat[qi]) / norms / norms[qi]
        order = sorted(
            [(-(sims[i]), ids[i]) for i in range(len(ids)) if ids[i] != qid]
        )[:4]
        expect = [nid for _, nid in order]
        assert [nid for _, nid in sorted(by_q[qid])] == expect


def test_ann_lsh_candidates_share_bucket(spark, emb):
    out = ann.cosine_topk_lsh(emb, emb.where(F.col("vec_id") < 3), k=4)
    rows = out.collect()
    assert all(r.rnk <= 4 and -1.0 <= r.sim <= 1.0 for r in rows)
    # LSH recall vs brute force is positive (same-bucket neighbors exist)
    assert len(rows) > 0


def test_multimodal_plumbing(spark, docs):
    from tripleforge.multimodal import extract_features, media_from_documents

    media = media_from_documents(docs)
    feats = extract_features(media, dim=8, fake=True)
    rows = feats.collect()
    assert len(rows) == docs.count()
    assert all(len(r.feature) == 8 for r in rows)
    assert all(0.0 <= x <= 1.0 for r in rows for x in r.feature)
    # deterministic across partitionings
    feats2 = extract_features(media.repartition(7), dim=8, fake=True)
    a = {r.media_id: r.feature for r in rows}
    b = {r.media_id: r.feature for r in feats2.collect()}
    assert a == b


def test_multimodal_decode_stub_raises():
    from tripleforge.multimodal import decode_stub

    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", "image", fake=False)

def test_minhash_verified_equals_candidate_intersect_exact(spark):
    """VERDICT r1: verified-mode semantics must be IDENTICAL to
    (LSH candidates ∩ exact jaccard ≥ t) — but computed candidate-
    restricted, never via a full-corpus jaccard pass."""
    docs = [
        (1, "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 3),
        (2, "alpha bravo charlie delta echo foxtrot golf hotel india juliet " * 3 + " extra"),
        (3, "zeta eta theta iota kappa lambda mu nu xi omicron " * 6),
        (4, "zeta eta theta iota kappa lambda mu nu xi omicron " * 6 + " tail"),
        (5, "unrelated totally different content with other words entirely here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t = 0.3
    cand = {
        (r.doc_a, r.doc_b)
        for r in text.minhash_lsh_pairs(df, verify_threshold=None).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in text.jaccard_pairs(df, threshold=t).collect()
    }
    expected = {p: j for p, j in exact.items() if p in cand}
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in text.minhash_lsh_pairs(df, verify_threshold=t).collect()
    }
    assert got == expected
    assert got  # non-vacuous: at least one verified pair


def test_minhash_verify_is_candidate_restricted_in_plan(spark):
    """The verified plan must NOT contain the full posting self-join
    (a join keyed by the bare shingle): candidates arrive via the
    band/bucket join, and verification intersects the per-doc shingle
    sets attached by doc-keyed joins — so NO join in the plan may be
    keyed by a shingle column at all, and the codegen array_intersect
    must be present (r4 restructure: one groupBy computes signatures +
    collect_list(sh); verify is array_intersect on candidates only)."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g x")], "doc_id long, text string"
    )
    plan = text.minhash_lsh_pairs(df, verify_threshold=0.1)._jdf.queryExecution().optimizedPlan().toString()
    import re

    bad = [
        line
        for line in plan.split("\n")
        if "Join " in line and re.search(r"sh#\d+L? = sh#\d+L?", line)
    ]
    assert not bad, f"shingle-keyed joins in plan: {bad}"
    # non-vacuous: candidate verification via set intersection, and the
    # doc-keyed attach joins must exist
    assert "array_intersect" in plan
    assert any(
        re.search(r"doc_b#\d+L? = doc(_b)?#\d+L?", line)
        for line in plan.split("\n")
        if "Join " in line
    ), plan


def test_posting_cache_released_after_use(spark):
    """VERDICT r2: repeated jaccard/minhash calls in a long-lived
    session must not accumulate cached partitions. The shared posting
    list is a lazy localCheckpoint — ContextCleaner releases its blocks
    once the result plan is unreferenced (DataFrame.persist would pin a
    CacheManager entry forever)."""
    import gc
    import time

    from tripleforge import text

    sc = spark.sparkContext
    base = len(sc._jsc.getPersistentRDDs())
    df = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta " * 3 + str(i % 3))
         for i in range(30)],
        "doc_id long, text string",
    )
    out = text.jaccard_pairs(df, threshold=0.1)
    assert out.count() > 0
    out2 = text.minhash_lsh_pairs(df, verify_threshold=0.1)
    out2.count()
    del out, out2
    gc.collect()
    spark._jvm.System.gc()
    # ContextCleaner is async — poll until the blocks drain
    for _ in range(40):
        if len(sc._jsc.getPersistentRDDs()) <= base:
            break
        time.sleep(0.5)
        gc.collect()
        spark._jvm.System.gc()
    assert len(sc._jsc.getPersistentRDDs()) <= base, (
        "posting-list blocks survived garbage collection"
    )


def test_multiprobe_lsh_recall_gate(spark):
    """VERDICT r2 #8: recall@5 of multi-probe LSH vs the exact
    brute-force oracle must be >= 0.9. The fixture is CLUSTERED
    embeddings (deterministic centers + small noise) — the shape real
    embedding models produce and the regime LSH is built for; on
    isotropic uniform noise (the sf testdata embeddings) hyperplane LSH
    recall is near zero by construction for every index, documented in
    SCALE.md §ANN."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(20, 64) * 3
    rows = [
        (i, [float(x) for x in centers[i % 20] + rng.randn(64) * 0.3])
        for i in range(400)
    ]
    em = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = em.where(F.col("vec_id") < 10)
    exact = ann.cosine_topk(em, q, k=5)
    multi = ann.cosine_topk_lsh(em, q, k=5, n_bits=8, dim=64, multiprobe=1)
    single = ann.cosine_topk_lsh(em, q, k=5, n_bits=8, dim=64)
    r_multi = ann.recall_at_k(multi, exact, k=5)
    r_single = ann.recall_at_k(single, exact, k=5)
    assert r_multi >= 0.9, f"multi-probe recall@5 {r_multi} < 0.9"
    assert r_multi >= r_single  # fan-out can only add candidates
    # multiprobe=2 (r4: hamming-2 probe set, 1+8+28=37 probes at
    # n_bits=8): recall is monotone in the probe radius
    multi2 = ann.cosine_topk_lsh(em, q, k=5, n_bits=8, dim=64, multiprobe=2)
    r_multi2 = ann.recall_at_k(multi2, exact, k=5)
    assert r_multi2 >= r_multi
    # probe-array width sanity: 1 + C(8,1) + C(8,2)
    import pyspark.sql.functions as _F

    width = (
        em.limit(1)
        .select(_F.size(ann.lsh_probe_buckets(
            _F.col("embedding"), ann.hyperplanes(64, 8, 42), 2)).alias("n"))
        .first()["n"]
    )
    assert width == 37
    with pytest.raises(ValueError, match="exceeds n_bits"):
        ann.lsh_probe_buckets(_F.col("embedding"), ann.hyperplanes(64, 8, 42), 9)


def test_ivf_recall_gate_and_determinism(spark):
    """IVF coarse-quantizer variant (r3b): on the clustered fixture
    (the regime IVF is built for) recall@5 vs brute force must be
    >= 0.9 at nprobe=3/16 cells; the index is deterministic (seeded
    driver-side spherical k-means on an id-ordered sample) and the
    whole pipeline is JVM-side."""
    import numpy as np

    rng = np.random.RandomState(7)
    centers = rng.randn(20, 64) * 3
    rows = [
        (i, [float(x) for x in centers[i % 20] + rng.randn(64) * 0.3])
        for i in range(400)
    ]
    em = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = em.where(F.col("vec_id") < 10)
    exact = ann.cosine_topk(em, q, k=5)
    ivf = ann.cosine_topk_ivf(em, q, k=5, n_centroids=16, nprobe=3)
    r = ann.recall_at_k(ivf, exact, k=5)
    assert r >= 0.9, f"IVF recall@5 {r} < 0.9"
    again = ann.cosine_topk_ivf(em, q, k=5, n_centroids=16, nprobe=3)
    assert sorted(map(tuple, ivf.collect())) == sorted(
        map(tuple, again.collect())
    )
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    # more probes can only add candidates → recall is monotone
    wide = ann.cosine_topk_ivf(em, q, k=5, n_centroids=16, nprobe=8)
    assert ann.recall_at_k(wide, exact, k=5) >= r


def test_cosine_near_dup_pairs(spark):
    """Embedding-cosine near-dup pairs (r4): symmetric, id_a < id_b,
    LSH-blocked with exact verify; brute-force subset property — every
    returned pair really is >= threshold, and every same-bucket pair
    >= threshold is returned (candidate-complete within the blocking)."""
    import numpy as np

    rng = np.random.RandomState(11)
    base = rng.randn(30, 64)
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    # plant two near-dup pairs: 100/101 ~ 0, 102/103 ~ 1
    rows.append((100, [float(x) for x in base[0] + rng.randn(64) * 0.01]))
    rows.append((101, [float(x) for x in base[0] + rng.randn(64) * 0.01]))
    em = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ann.cosine_near_dup_pairs(em, threshold=0.95, n_bits=8, dim=64)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert (100, 101) in got
    assert (0, 100) in got and (0, 101) in got
    assert all(r.cos >= 0.95 for r in out.collect())
    assert all(r.id_a < r.id_b for r in out.collect())


def test_curate_cli(tmp_path):
    """jobs/curate.py end-to-end: all ops over the sf0.001 tables,
    one JSON line per op, parquet outputs readable."""
    import json as _json
    import subprocess
    import sys as _sys

    out = str(tmp_path / "cur")
    r = subprocess.run(
        [_sys.executable, "jobs/curate.py",
         "--docs", "/root/testdata/sf0.001/documents.parquet",
         "--embeddings", "/root/testdata/sf0.001/embeddings.parquet",
         "--out", out, "--ops", "exact,jaccard,cosine,annotate",
         "--master", "local[4]"],
        capture_output=True, text=True, timeout=600,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-1500:]
    lines = [_json.loads(l) for l in r.stdout.strip().splitlines() if l.startswith("{")]
    by_op = {l["op"]: l for l in lines}
    # r5: every --docs run also commits the incremental-dedup state
    assert set(by_op) == {"exact", "jaccard", "cosine", "annotate", "state"}
    assert all("error" not in l for l in lines), lines
    assert by_op["annotate"]["rows"] > 0
    import os as _os

    assert _os.path.isdir(_os.path.join(out, "annotate"))
    assert _os.path.isdir(_os.path.join(out, "state", "fingerprints"))
    assert _os.path.isdir(_os.path.join(out, "state", "minhash_state"))


def test_sniff_bytes_magic_numbers():
    """r5: header sniffing on crafted byte fixtures — every container
    the sniffer claims to know, plus the unknown fallback."""
    from tripleforge.multimodal import sniff_bytes

    png = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
           + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
           + bytes([8, 2, 0, 0, 0]) + bytes(4))
    assert sniff_bytes(png) == ("image", "image/png", 640, 480, None)

    sof = (b"\xff\xc0" + (11).to_bytes(2, "big") + bytes([8])
           + (33).to_bytes(2, "big") + (44).to_bytes(2, "big")
           + bytes([1, 1, 0x11, 0]))
    jpeg = (b"\xff\xd8\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
            + bytes(9) + sof + b"\xff\xd9")
    assert sniff_bytes(jpeg) == ("image", "image/jpeg", 44, 33, None)

    gif = (b"GIF89a" + (12).to_bytes(2, "little")
           + (34).to_bytes(2, "little") + bytes(3))
    assert sniff_bytes(gif) == ("image", "image/gif", 12, 34, None)

    fmt = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (16000).to_bytes(4, "little")
           + (2).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    wav = (b"RIFF" + (36 + 32000).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little") + fmt
           + b"data" + (32000).to_bytes(4, "little") + bytes(32000))
    assert sniff_bytes(wav) == ("audio", "audio/wav", None, None, 2000)

    assert sniff_bytes(b"RIFF" + bytes(4) + b"WEBPVP8 ")[:2] == (
        "image", "image/webp")
    assert sniff_bytes(b"ID3\x04\x00" + bytes(20))[:2] == ("audio", "audio/mpeg")
    assert sniff_bytes(b"\xff\xfb\x90\x00" + bytes(8))[:2] == ("audio", "audio/mpeg")
    assert sniff_bytes(bytes(4) + b"ftypisom" + bytes(8))[:2] == (
        "video", "video/mp4")
    assert sniff_bytes(b"hello world") == (
        None, "application/octet-stream", None, None, None)
    assert sniff_bytes(b"") == (None, "application/octet-stream", None, None, None)


def _box(btype: bytes, payload: bytes) -> bytes:
    return (8 + len(payload)).to_bytes(4, "big") + btype + payload


def test_sniff_mp4_moov_walk():
    """r5: MP4 duration/dimensions from a hand-built moov (mvhd v0 +
    trak/tkhd) — the ISO BMFF box walk, still no codec."""
    from tripleforge.multimodal import sniff_bytes

    mvhd = (bytes(4)  # version 0 + flags
            + bytes(8)  # ctime, mtime
            + (1000).to_bytes(4, "big")  # timescale
            + (12500).to_bytes(4, "big")  # duration -> 12500 ms
            + bytes(80))
    tkhd = (bytes(4) + bytes(8) + (1).to_bytes(4, "big") + bytes(4)
            + bytes(4)  # duration
            + bytes(8) + bytes(8) + bytes(36)  # reserved/layer/matrix
            + (1280 << 16).to_bytes(4, "big")
            + (720 << 16).to_bytes(4, "big"))
    moov = _box(b"moov", _box(b"mvhd", mvhd) + _box(b"trak", _box(b"tkhd", tkhd)))
    mp4 = _box(b"ftyp", b"isom" + bytes(8)) + moov
    assert sniff_bytes(mp4) == ("video", "video/mp4", 1280, 720, 12500)

    # 64-bit largesize moov wrapper parses identically
    large = ((1).to_bytes(4, "big") + b"moov"
             + (16 + len(_box(b"mvhd", mvhd))).to_bytes(8, "big")
             + _box(b"mvhd", mvhd))
    mp4b = _box(b"ftyp", b"isom" + bytes(8)) + large
    assert sniff_bytes(mp4b) == ("video", "video/mp4", None, None, 12500)


def test_sniff_metadata_end_to_end(spark):
    """synth_media -> sniff_metadata round-trips the header values the
    synthesizer encoded, through the Arrow kernel (distributed path)."""
    from tripleforge.multimodal import sniff_metadata, synth_media

    docs = spark.createDataFrame(
        [(0, 100), (1, 200), (2, 300), (3, 400), (4, 640)],
        "doc_id long, n_chars long",
    )
    out = {r["media_id"]: r for r in sniff_metadata(synth_media(docs)).collect()}
    assert out[0]["mime"] == "image/png" and out[0]["width"] == 101
    assert out[1]["mime"] == "image/jpeg" and out[1]["height"] == 201
    assert out[2]["mime"] == "image/gif" and out[2]["width"] == 301
    assert out[3]["mime"] == "audio/wav" and out[3]["duration_ms"] == 31  # 500*1000//16000
    assert out[4]["mime"] == "image/png" and out[4]["width"] == 1  # 640%640+1
    assert all(r["n_bytes"] > 0 for r in out.values())


def test_incremental_curation_cross_wave(spark, tmp_path):
    """r5 (VERDICT r4 #10): wave 2 dedups against wave 1's committed
    state snapshot — fingerprint join for exact dups, band-bucket join
    + stored-set Jaccard verify for near dups — without wave-1 text."""
    from tripleforge import incremental

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    wave1 = spark.createDataFrame(
        [(1, base), (2, "completely unrelated text about spark plans "
                        "and shuffle exchanges in a distributed engine"),
         (3, "third document with its own words entirely")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "state")
    incremental.write_state(wave1, state)

    near = base.replace("tonight", "tomorrow")  # 1-token perturbation
    wave2 = spark.createDataFrame(
        [(101, base),              # exact dup of doc 1
         (102, near),              # near dup of doc 1
         (103, "a brand new document that matches nothing prior")],
        "doc_id long, text string",
    )

    ex = incremental.incremental_exact(wave2, state).collect()
    assert [(r["doc"], r["dup_of"]) for r in ex] == [(101, 1)]

    pairs = incremental.incremental_minhash_pairs(
        wave2, state, verify_threshold=0.5
    ).collect()
    got = {(r["doc_new"], r["doc_prior"]) for r in pairs}
    assert (102, 1) in got          # the near dup is found cross-wave
    assert (101, 1) in got          # the exact dup trivially qualifies
    assert all(r["doc_prior"] != 3 or r["doc_new"] != 103 for r in pairs)
    assert not any(r["doc_new"] == 103 for r in pairs)  # novel doc clean
    for r in pairs:
        assert r["jaccard"] >= 0.5

    # chaining: wave-2 state unions wave-1's, so wave 3 sees ONE snapshot
    state2 = str(tmp_path / "state2")
    incremental.write_state(wave2, state2, prior_dir=state)
    wave3 = spark.createDataFrame([(201, near)], "doc_id long, text string")
    ex3 = incremental.incremental_exact(wave3, state2).collect()
    assert [(r["doc"], r["dup_of"]) for r in ex3] == [(201, 102)]


def test_minhash_refactor_parity(spark):
    """The r5 state-builder refactor keeps minhash_lsh_pairs
    value-identical (the helpers ARE the old inline stages)."""
    from tripleforge import text as tx

    docs = spark.createDataFrame(
        [(i, f"shared prefix tokens one two three four five six {i % 3}")
         for i in range(12)],
        "doc_id long, text string",
    )
    pairs = tx.minhash_lsh_pairs(docs, verify_threshold=0.9).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # docs with equal i%3 are exact dups of each other -> all such pairs
    expected = {(a, b) for a in range(12) for b in range(12)
                if a < b and a % 3 == b % 3}
    assert got == expected


# ---------------------------------------------------------------------------
# PII redaction + repetition ratio (r5)
# ---------------------------------------------------------------------------
def test_redact_all_kinds(spark):
    df = spark.createDataFrame(
        [("mail a.b+x@ex-corp.io ip 192.168.0.1 ssn 123-45-6789 "
          "tel 555-123-4567 end",)],
        "t string",
    )
    out = df.select(text.redact(F.col("t")).alias("r")).first().r
    assert out == "mail <EMAIL> ip <IP> ssn <SSN> tel <PHONE> end"


def test_redact_sequential_no_double_redaction(spark):
    """An email's dotted-digit local part is consumed by the email
    pattern before the IP pattern runs."""
    df = spark.createDataFrame([("x 10.0.0.1@ex.com y",)], "t string")
    out = df.select(text.redact(F.col("t")).alias("r")).first().r
    assert out == "x <EMAIL> y"


def test_redact_kind_subset_and_counts(spark):
    df = spark.createDataFrame(
        [("a@b.co and 10.0.0.1 and 10.0.0.2",)], "t string"
    )
    only_ip = df.select(
        text.redact(F.col("t"), kinds=("ipv4",)).alias("r")
    ).first().r
    assert only_ip == "a@b.co and <IP> and <IP>"
    counts = text.pii_counts(F.col("t"))
    row = df.select(
        counts["email"].alias("e"), counts["ipv4"].alias("i"),
        counts["ssn"].alias("s"), counts["phone"].alias("p"),
    ).first()
    assert (row.e, row.i, row.s, row.p) == (1, 2, 0, 0)


def test_redact_ssn_phone_disambiguation(spark):
    """Digit-dash shapes route to the right placeholder: 3-2-4 is SSN,
    3-3-4 is phone; neither pattern fires inside the other."""
    df = spark.createDataFrame([("123-45-6789 555-123-4567",)], "t string")
    out = df.select(text.redact(F.col("t")).alias("r")).first().r
    assert out == "<SSN> <PHONE>"


def test_repetition_ratio(spark):
    df = spark.createDataFrame(
        [(0, "a\nb\na\na"), (1, "x\ny\nz"), (2, ""), (3, "q")],
        "doc_id long, t string",
    )
    got = {
        r.doc_id: r.rr
        for r in df.select(
            "doc_id", text.repetition_ratio(F.col("t")).alias("rr")
        ).collect()
    }
    assert got == {0: 0.5, 1: 0.0, 2: 0.0, 3: 0.0}
