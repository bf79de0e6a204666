"""Training-data pipeline operators: dedup, similarity, text stats,
multimodal plumbing — correctness vs plain numpy/python oracles."""

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
        (3, "completely different text about spark query engines and data"),
        (4, "short one"),
        (5, "the quick brown fox jumps over the lazy dog again and AGAIN"),  # case dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.spark
class TestDedup:
    def test_exact(self, spark, docs_df):
        from uci_searchengine_spark.operators.dedup import dedup_exact

        out = {r["id"]: (r["keep"], r["group_size"]) for r in dedup_exact(docs_df, "doc_id", "text").collect()}
        # 0,1,5 share a normalized fingerprint (lowercased) → rep = 0
        assert out[0] == (True, 3)
        assert out[1] == (False, 3)
        assert out[5] == (False, 3)
        assert out[3] == (True, 1)

    def test_ngram_jaccard(self, spark, docs_df):
        from uci_searchengine_spark.operators.dedup import ngram_jaccard_pairs

        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs_df, "doc_id", "text", n=3, threshold=0.5).collect()
        }
        # exact dups → jaccard 1.0
        assert pairs[(0, 1)] == pytest.approx(1.0)
        assert pairs[(0, 5)] == pytest.approx(1.0)
        # near dup (one word differs) → high but < 1
        assert 0.5 <= pairs[(0, 2)] < 1.0
        assert (0, 3) not in pairs

    def test_minhash_lsh_finds_near_dups(self, spark, docs_df):
        from uci_searchengine_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
            shingles,
        )

        sh = shingles(docs_df, "doc_id", "text", n=3)
        sigs = minhash_signatures(sh, n_perm=32)
        pairs = {
            (r["id_a"], r["id_b"])
            for r in lsh_candidate_pairs(sigs, n_bands=8, rows_per_band=4).collect()
        }
        assert (0, 1) in pairs and (0, 5) in pairs  # identical shingle sets
        assert (0, 2) in pairs  # near dup: some band should collide
        assert (0, 3) not in pairs and (3, 4) not in pairs

    def test_lsh_bucket_cap_bounds_pairs_same_components(self, spark):
        """Pathological 90%-duplicate corpus (the boilerplate-cluster
        web case): one LSH bucket holds ~45 near-identical docs. With
        bucket_cap the pair volume is LINEAR in the cluster (star
        around the min-id rep), not quadratic — and connected
        components (the dedup consumer) are identical to all-pairs
        mode, so keep/drop decisions don't change."""
        from uci_searchengine_spark.operators.dedup import (
            connected_components,
            lsh_candidate_pairs,
            minhash_signatures,
            shingles,
        )

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [(i, base) for i in range(45)]  # exact-dup cluster
        rows += [
            (100 + i, f"unique{i} " + " ".join(f"w{i}{j}" for j in range(10)))
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        sh = shingles(df, "doc_id", "text", n=3)
        sigs = minhash_signatures(sh, n_perm=32).cache()
        exact = lsh_candidate_pairs(sigs, 8, 4).cache()
        capped = lsh_candidate_pairs(sigs, 8, 4, bucket_cap=10).cache()
        n_exact, n_capped = exact.count(), capped.count()
        # all-pairs: 45*44/2 = 990; star: 44
        assert n_exact == 990 and n_capped == 44
        comp_e = {
            (r["id"], r["comp"])
            for r in connected_components(exact).collect()
        }
        comp_c = {
            (r["id"], r["comp"])
            for r in connected_components(capped).collect()
        }
        assert comp_e == comp_c
        # sub-cap buckets keep exact all-pairs behavior
        tiny = lsh_candidate_pairs(sigs, 8, 4, bucket_cap=1000)
        assert tiny.count() == n_exact

    def test_minhash_estimates_jaccard(self, spark, docs_df):
        """Signature agreement rate ≈ true Jaccard (property of minhash)."""
        from uci_searchengine_spark.operators.dedup import (
            minhash_signatures,
            ngram_jaccard_pairs,
            shingles,
        )

        sh = shingles(docs_df, "doc_id", "text", n=3)
        sigs = {r["id"]: r["sig"] for r in minhash_signatures(sh, n_perm=32).collect()}
        true_j = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(docs_df, "doc_id", "text", n=3, threshold=0.01).collect()
        }
        est = np.mean([a == b for a, b in zip(sigs[0], sigs[2])])
        assert abs(est - true_j[(0, 2)]) < 0.35  # 32 perms → coarse but sane

    def test_simhash_near_pairs(self, spark, docs_df):
        from uci_searchengine_spark.operators.dedup import simhash, simhash_near_pairs

        sh = simhash(docs_df, "doc_id", "text")
        vals = {r["id"]: r["simhash"] for r in sh.collect()}
        assert vals[0] == vals[1]  # identical token multiset
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_near_pairs(sh).collect()
        }
        assert pairs[(0, 1)] == 0
        assert 0 <= pairs[(0, 2)] <= 15  # near dup within banding reach


@pytest.mark.spark
class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        # clustered vectors (10 centers + noise) — the realistic regime for
        # near-neighbor search; iid Gaussians have near-orthogonal "nearest"
        # neighbors where any LSH is intentionally weak
        rng = np.random.RandomState(3)
        centers = rng.standard_normal((10, 64))
        vecs = (
            centers[np.arange(100) % 10] + 0.3 * rng.standard_normal((100, 64))
        ).astype(np.float32)
        pdf = pd.DataFrame(
            {"vec_id": np.arange(100, dtype=np.int64), "embedding": list(map(list, vecs))}
        )
        return spark.createDataFrame(pdf), vecs

    def test_bruteforce_matches_numpy(self, spark, emb):
        from uci_searchengine_spark.operators.similarity import ann_bruteforce

        df, vecs = emb
        q = df.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        got = ann_bruteforce(df, q, k=5).collect()
        v = vecs.astype(np.float64)
        sims = (v @ v.T) / (
            np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :]
        )
        for qid in range(3):
            order = np.lexsort((np.arange(100), -sims[qid]))[:5]
            got_ids = [r["vec_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["q_id"] == qid]
            assert got_ids == list(order), qid

    def test_ivf_recall(self, spark, emb):
        from pyspark.sql import functions as F

        from uci_searchengine_spark.operators.similarity import (
            ann_bruteforce,
            ivf_centroids,
            ivf_search,
        )

        df, _ = emb
        cents = ivf_centroids(df, "embedding", n_cells=8, seed=13)
        q = df.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        exact = ann_bruteforce(df, q, k=5).collect()
        approx = ivf_search(df, q, cents, k=5, n_probe=3).collect()
        exact_sets: dict = {}
        for r in exact:
            exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
        hit = sum(r["vec_id"] in exact_sets[r["q_id"]] for r in approx)
        assert hit / max(len(approx), 1) > 0.6  # clustered data: good recall

    def test_lsh_recall(self, spark, emb):
        from uci_searchengine_spark.operators.similarity import ann_bruteforce, ann_lsh

        df, _ = emb
        q = df.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
        )
        exact = ann_bruteforce(df, q, k=5).collect()
        approx = ann_lsh(df, q, k=5, n_planes=6, multiprobe_bits=2).collect()
        exact_sets = {}
        for r in exact:
            exact_sets.setdefault(r["q_id"], set()).add(r["vec_id"])
        hit = total = 0
        for r in approx:
            total += 1
            hit += r["vec_id"] in exact_sets[r["q_id"]]
        assert hit / max(total, 1) > 0.5  # multiprobe SRP: coarse recall check
        # every query at least finds itself (cosine 1.0 in its own bucket)
        got_self = {r["q_id"] for r in approx if r["vec_id"] == r["q_id"]}
        assert got_self == set(range(10))


@pytest.mark.spark
class TestTextStats:
    def test_counts_and_quality(self, spark, docs_df):
        from uci_searchengine_spark.functions import textstats

        rows = {
            r["doc_id"]: r
            for r in docs_df.select(
                "doc_id",
                textstats.ws_token_count(F.col("text")).alias("ws"),
                textstats.bpe_ish_token_count(F.col("text")).alias("bpe"),
                textstats.quality_score(F.col("text")).alias("q"),
                textstats.lang_id(F.col("text")).alias("lang"),
                textstats.fingerprint_md5(F.col("text")).alias("fp"),
            ).collect()
        }
        assert rows[0]["ws"] == 12
        assert rows[4]["ws"] == 2
        assert rows[0]["lang"] == "en"
        assert 0.0 <= rows[4]["q"] < rows[0]["q"] <= 1.0
        expected_fp = hashlib.md5(
            b"the quick brown fox jumps over the lazy dog again and again"
        ).hexdigest()
        assert rows[0]["fp"] == expected_fp
        assert rows[0]["fp"] == rows[5]["fp"]  # case-normalized


@pytest.mark.spark
class TestMultimodal:
    def test_image_meta_plumbing(self, spark, docs_df):
        from uci_searchengine_spark.operators.multimodal import decode_image_meta

        d = docs_df.select("doc_id", F.encode("text", "utf-8").alias("payload"))
        out = {r["doc_id"]: r for r in decode_image_meta(d, "doc_id", "payload").collect()}
        raw = b"the quick brown fox jumps over the lazy dog again and again"
        h = hashlib.md5(raw).digest()
        assert out[0]["n_bytes"] == len(raw)
        assert out[0]["width"] == 16 + h[0]
        assert out[0]["height"] == 16 + h[1]
        assert out[0]["format"] in ("png", "jpeg")
        assert out[0]["md5"] == hashlib.md5(raw).hexdigest()

    def test_real_image_header_parsers(self):
        """Stdlib parsers invert the valid-container generators exactly;
        pixel-level decode stays an honest stub."""
        from uci_searchengine_spark.operators.multimodal import (
            _decode_image_fake,
            _decode_image_real,
            _decode_pixels_real,
            synth_image_bytes,
        )

        for i in (0, 1, 2, 3, 57, 100, 4999):
            w, h, fmt = _decode_image_real(synth_image_bytes(i))
            assert (w, h) == (16 + i % 101, 16 + (7 * i) % 89), i
            assert fmt == ["png", "gif", "jpeg"][i % 3]
        # JPEG parser walks past non-SOF segments (APP0 etc.)
        import struct

        app0 = b"\xff\xe0" + struct.pack(">H", 6) + b"JF\x00\x00"
        sof = struct.pack(">BHHB", 8, 33, 44, 1) + b"\x01\x11\x00"
        jpeg = b"\xff\xd8" + app0 + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof + b"\xff\xd9"
        assert _decode_image_real(jpeg) == (44, 33, "jpeg")
        with pytest.raises(ValueError):
            _decode_image_real(b"not an image at all")
        with pytest.raises(ValueError):
            _decode_image_real(b"\x89PNG\r\n\x1a\n12345")  # truncated
        with pytest.raises(NotImplementedError):
            _decode_pixels_real(b"xx")
        # fake stays available and deterministic
        assert _decode_image_fake(b"xx") == _decode_image_fake(b"xx")

    def test_image_meta_real_fallback_mode(self, spark, docs_df):
        """on_error='fake': valid containers decode real, arbitrary bytes
        fall back to the deterministic fake (mixed corpus)."""
        from uci_searchengine_spark.operators.multimodal import (
            _decode_image_fake,
            decode_image_meta,
            synth_image_bytes,
        )

        rows = [(0, synth_image_bytes(0)), (1, b"arbitrary junk bytes")]
        d = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {
            r["doc_id"]: r
            for r in decode_image_meta(
                d, "doc_id", "payload", use_real=True, on_error="fake"
            ).collect()
        }
        assert (out[0]["width"], out[0]["height"], out[0]["format"]) == (16, 16, "png")
        fw, fh, ff = _decode_image_fake(b"arbitrary junk bytes")
        assert (out[1]["width"], out[1]["height"], out[1]["format"]) == (fw, fh, ff)

    def test_frame_samples(self, spark, docs_df):
        from uci_searchengine_spark.operators.multimodal import sample_frames

        d = docs_df.select("doc_id", F.encode("text", "utf-8").alias("payload"))
        out = sample_frames(d, "doc_id", "payload", every_n=4).collect()
        assert all(r["frame_idx"] % 4 == 0 for r in out)
        assert {r["doc_id"] for r in out} == {0, 1, 2, 3, 4, 5}

    def test_resize_geometry_modes(self, spark):
        """fit letterboxes inside the box, fill covers it, stretch
        ignores aspect — pinned against hand-computed geometry on real
        container bytes (a wide GIF: 116x93)."""
        from uci_searchengine_spark.operators.multimodal import (
            resize_image_meta,
            synth_image_bytes,
        )

        d = spark.createDataFrame(
            [(100, synth_image_bytes(100))], "doc_id long, payload binary"
        )
        fit = resize_image_meta(d, "doc_id", "payload", 64, 64, "fit", use_real=True).first()
        assert (fit["width"], fit["height"]) == (116, 93)
        assert (fit["out_w"], fit["out_h"]) == (64, 51)  # bound by width
        fill = resize_image_meta(d, "doc_id", "payload", 64, 64, "fill", use_real=True).first()
        assert (fill["out_w"], fill["out_h"]) == (79, 64)  # bound by height
        st = resize_image_meta(d, "doc_id", "payload", 64, 64, "stretch", use_real=True).first()
        assert (st["out_w"], st["out_h"]) == (64, 64)
        with pytest.raises(ValueError):
            resize_image_meta(d, "doc_id", "payload", 64, 64, "zoom")

    def test_resize_resample_is_stubbed(self, spark):
        from uci_searchengine_spark.operators.multimodal import (
            resize_image_meta,
            synth_image_bytes,
        )

        d = spark.createDataFrame(
            [(0, synth_image_bytes(0))], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match="PIL|NotImplemented"):
            resize_image_meta(
                d, "doc_id", "payload", 64, 64, use_real=True, resample=True
            ).collect()

    def test_image_features_deterministic_and_stubbed(self, spark):
        from uci_searchengine_spark.operators.multimodal import (
            image_features,
            synth_image_bytes,
        )

        rows = [(i, synth_image_bytes(i)) for i in range(4)]
        d = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r["features"] for r in image_features(d, "doc_id", "payload", dim=8).collect()}
        assert all(len(v) == 8 for v in out.values())
        # formula pin for doc 0 (png 16x16): base = 31*16 + 7*16 + 0
        base = 31 * 16 + 7 * 16
        assert out[0] == [((base + 13 * i) % 997) / 997.0 for i in range(8)]
        # two runs identical (determinism across partitionings)
        again = {r["doc_id"]: r["features"] for r in image_features(d.repartition(3), "doc_id", "payload", dim=8).collect()}
        assert again == out
        with pytest.raises(Exception, match="PIL|NotImplemented"):
            image_features(d, "doc_id", "payload", use_real=True).collect()


@pytest.mark.spark
class TestAudio:
    def test_audio_meta_plumbing(self, spark, docs_df):
        from uci_searchengine_spark.operators.multimodal import decode_audio_meta

        d = docs_df.select("doc_id", F.encode("text", "utf-8").alias("payload"))
        out = {
            r["doc_id"]: r
            for r in decode_audio_meta(d, "doc_id", "payload", chunk_bytes=16).collect()
        }
        raw = b"the quick brown fox jumps over the lazy dog again and again"
        h = hashlib.md5(raw).digest()
        chunks = (len(raw) + 15) // 16
        fp = hashlib.md5(
            "".join(
                hashlib.md5(raw[c * 16 : (c + 1) * 16]).hexdigest()
                for c in range(chunks)
            ).encode()
        ).hexdigest()
        assert out[0]["n_bytes"] == len(raw)
        assert out[0]["n_chunks"] == chunks
        assert out[0]["sample_rate"] == [8000, 16000, 22050, 44100, 48000][h[0] % 5]
        assert out[0]["loudness_fp"] == fp

    def test_real_wav_decode(self, spark):
        """Real WAV path: sample_rate read from the container, chunking
        over the decoded PCM frames; wave round-trips the generator."""
        from uci_searchengine_spark.operators.multimodal import (
            _decode_audio_real,
            decode_audio_meta,
            synth_wav_bytes,
        )

        for i in (0, 3, 7, 123):
            rate, body = _decode_audio_real(synth_wav_bytes(i))
            assert rate == [8000, 16000, 22050, 44100, 48000][i % 5]
            assert len(body) == 2 * (50 + i % 100)
        rows = [(i, synth_wav_bytes(i)) for i in range(6)]
        d = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {
            r["doc_id"]: r
            for r in decode_audio_meta(
                d, "doc_id", "payload", chunk_bytes=64, use_real=True
            ).collect()
        }
        for i in range(6):
            pcm_len = 2 * (50 + i % 100)
            assert out[i]["sample_rate"] == [8000, 16000, 22050, 44100, 48000][i % 5]
            assert out[i]["n_chunks"] == max(1, (pcm_len + 63) // 64)
            assert out[i]["n_bytes"] == len(synth_wav_bytes(i))

    def test_compressed_audio_decoder_is_stubbed(self):
        from uci_searchengine_spark.operators.multimodal import (
            _decode_compressed_audio_real,
        )

        with pytest.raises(NotImplementedError):
            _decode_compressed_audio_real(b"ID3")


@pytest.mark.spark
class TestDupClusters:
    def test_connected_components_known_graph(self, spark):
        from uci_searchengine_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
            "id_a long, id_b long",
        )
        got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}

    def test_long_chain_converges(self, spark):
        from uci_searchengine_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "id_a long, id_b long"
        )
        got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
        assert set(got.values()) == {0} and len(got) == 13

    def test_star_equals_minlabel_random_graphs(self, spark):
        """Large-star/small-star (O(log n) rounds) produces the IDENTICAL
        labeling as min-label propagation on random graphs."""
        import random

        from uci_searchengine_spark.operators.dedup import connected_components

        rng = random.Random(42)
        for trial in range(3):
            n = 40
            edges = [
                (rng.randrange(n), rng.randrange(n))
                for _ in range(rng.randrange(10, 50))
            ]
            edges = [(a, b) for a, b in edges if a != b]
            if not edges:
                continue
            pairs = spark.createDataFrame(edges, "id_a long, id_b long")
            ml = {
                r["id"]: r["comp"]
                for r in connected_components(pairs, method="minlabel").collect()
            }
            st = {
                r["id"]: r["comp"]
                for r in connected_components(pairs, method="star").collect()
            }
            assert ml == st, (trial, sorted(edges))

    def test_star_path_graph_logarithmic_rounds(self, spark):
        """Path graph 0-1-2-…-64: min-label needs O(n) rounds; the star
        method must finish in O(log n) — the scale claim, asserted."""
        import math

        from uci_searchengine_spark.operators.dedup import connected_components

        n = 64
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n)], "id_a long, id_b long"
        )
        st_stats: dict = {}
        st = {
            r["id"]: r["comp"]
            for r in connected_components(
                pairs, method="star", max_iter=50, stats=st_stats
            ).collect()
        }
        assert set(st.values()) == {0} and len(st) == n + 1
        assert st_stats["rounds"] <= 2 * math.ceil(math.log2(n)) + 2, st_stats
        ml_stats: dict = {}
        connected_components(
            pairs, method="minlabel", max_iter=200, stats=ml_stats
        ).collect()
        # the contrast that motivates the star variant
        assert ml_stats["rounds"] > st_stats["rounds"]

    def test_pii_redaction(self, spark):
        from uci_searchengine_spark.functions.textstats import pii_hit_count, redact_pii

        df = spark.createDataFrame(
            [
                (0, "reach me: jo.doe+spam@mail.example.com or 555-123-4567"),
                (1, "ssn 987-65-4321 card 4111 1111 1111 1111 ok"),
                (2, "no pii here at all"),
            ],
            "id long, text string",
        )
        rows = {
            r["id"]: r
            for r in df.select(
                "id",
                redact_pii(F.col("text")).alias("clean"),
                pii_hit_count(F.col("text")).alias("n"),
            ).collect()
        }
        assert "<EMAIL>" in rows[0]["clean"] and "<PHONE>" in rows[0]["clean"]
        assert "@" not in rows[0]["clean"]
        assert rows[0]["n"] == 2
        assert "<SSN>" in rows[1]["clean"] and "<CARD>" in rows[1]["clean"]
        assert rows[2]["clean"] == "no pii here at all"
        assert rows[2]["n"] == 0


@pytest.mark.spark
def test_pagerank_matches_bruteforce(spark):
    """Fixed-iteration PageRank == plain-python reference on a seeded
    random digraph (incl. dangling nodes and a sink component)."""
    import random

    from uci_searchengine_spark.operators.links import pagerank

    rng = random.Random(42)
    n = 60
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(150)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, iterations=7, damping=0.85).collect()
    }

    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    rank = {v: 1.0 for v in nodes}
    for _ in range(7):
        incoming = {v: 0.0 for v in nodes}
        for a, b in edges:
            incoming[b] += rank[a] / out[a]
        rank = {v: 0.15 + 0.85 * incoming[v] for v in nodes}
    assert set(got) == set(rank)
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], rel=1e-9), v


@pytest.mark.spark
def test_hits_matches_bruteforce(spark):
    """Fixed-iteration HITS == plain-python reference on a seeded
    random digraph, and the hub/authority separation property on a
    star graph (a directory page is a hub, not an authority)."""
    import math
    import random

    from uci_searchengine_spark.operators.links import hits

    rng = random.Random(7)
    n = 40
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in hits(df, iterations=5).collect()
    }

    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(5):
        auth = {v: sum(hub[a] for a, b in edges if b == v) for v in nodes}
        na = math.sqrt(sum(x * x for x in auth.values()))
        auth = {v: x / na for v, x in auth.items()}
        hub = {v: sum(auth[b] for a, b in edges if a == v) for v in nodes}
        nh = math.sqrt(sum(x * x for x in hub.values()))
        hub = {v: x / nh for v, x in hub.items()}
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v][0] == pytest.approx(hub[v], rel=1e-9), v
        assert got[v][1] == pytest.approx(auth[v], rel=1e-9), v

    # star: node 0 links to 1..5 (directory); 1..5 link nowhere
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    sres = {r["node"]: r for r in hits(star, iterations=3).collect()}
    assert sres[0]["hub"] == pytest.approx(1.0)
    assert sres[0]["auth"] == 0.0
    assert all(sres[i]["hub"] == 0.0 for i in range(1, 6))
    assert all(
        sres[i]["auth"] == pytest.approx(1 / math.sqrt(5)) for i in range(1, 6)
    )


@pytest.mark.spark
class TestRepetitionAndDecontamination:
    def test_repetition_fractions_vs_python(self, spark, docs_df):
        from collections import Counter

        from uci_searchengine_spark.functions import textstats

        out = {
            r["doc_id"]: r
            for r in docs_df.select(
                "doc_id",
                F.round(textstats.top_word_fraction(F.col("text")), 9).alias("twf"),
                F.round(textstats.top_bigram_fraction(F.col("text")), 9).alias("tbf"),
                F.round(
                    textstats.duplicate_line_fraction(F.col("text")), 9
                ).alias("dlf"),
            ).collect()
        }
        for doc_id, text in [(r["doc_id"], r["text"]) for r in docs_df.collect()]:
            toks = text.strip().lower().split()
            exp_twf = max(Counter(toks).values()) / len(toks)
            grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
            exp_tbf = max(Counter(grams).values()) / len(grams) if grams else 0.0
            assert out[doc_id]["twf"] == pytest.approx(exp_twf, abs=1e-8)
            assert out[doc_id]["tbf"] == pytest.approx(exp_tbf, abs=1e-8)
            assert out[doc_id]["dlf"] == 0.0  # no newlines in fixture

    def test_duplicate_line_fraction(self, spark):
        from uci_searchengine_spark.functions import textstats

        df = spark.createDataFrame(
            [
                (0, "a line\nanother\na line\n\n  \nthird"),  # 4 non-empty, 1 dup
                (1, ""),
                (2, "x\nx\nx"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r["dlf"]
            for r in df.select(
                "doc_id",
                textstats.duplicate_line_fraction(F.col("text")).alias("dlf"),
            ).collect()
        }
        assert out[0] == pytest.approx(0.25)
        assert out[1] == 0.0
        assert out[2] == pytest.approx(2 / 3)

    def test_decontaminate_flags_overlap(self, spark, docs_df):
        from uci_searchengine_spark.operators.dedup import decontaminate

        ev = docs_df.filter(F.col("doc_id") == 0)
        tr = docs_df.filter(F.col("doc_id") > 0)
        hits = {
            r["id"]: r["n_shared"]
            for r in decontaminate(tr, ev, "doc_id", "text", n=4).collect()
        }
        # doc 1 is an exact dup, doc 5 a case-dup: all shingles shared.
        # doc 2 differs by one word; doc 3 shares nothing; doc 4 is short.
        assert hits[1] == hits[5] and hits[1] > 0
        assert 0 < hits.get(2, 0) < hits[1]
        assert 3 not in hits and 4 not in hits

    def test_minhash_inrow_equals_agg(self, spark, docs_df):
        from uci_searchengine_spark.operators.dedup import (
            minhash_signatures,
            minhash_signatures_inrow,
            shingles,
        )

        agg = {
            r["id"]: r["sig"]
            for r in minhash_signatures(
                shingles(docs_df, "doc_id", "text", n=3), n_perm=16, seed=7
            ).collect()
        }
        inrow = {
            r["id"]: r["sig"]
            for r in minhash_signatures_inrow(
                docs_df, "doc_id", "text", n_perm=16, seed=7, n=3
            ).collect()
        }
        assert agg == inrow


@pytest.mark.spark
def test_frontier_prioritized_vs_python(spark):
    """Anti-join + reference-count ranking == plain-python on a small
    graph; urls already crawled never appear; ties break url-asc."""
    from uci_searchengine_spark.operators.links import frontier_prioritized

    edges = [
        ("a", "x"), ("b", "x"), ("c", "x"),  # x: 3 refs
        ("a", "y"), ("b", "y"),              # y: 2 refs
        ("a", "z"),                          # z: 1 ref
        ("q", "w"),                          # src q not crawled: ignored
        ("a", "b"),                          # b crawled: not frontier
    ]
    links = spark.createDataFrame(edges, "src string, dst string")
    crawled = spark.createDataFrame(
        [("a",), ("b",), ("c",)], "url string"
    )
    got = [
        (r["url"], r["n_refs"])
        for r in frontier_prioritized(links, crawled).collect()
    ]
    assert got == [("x", 3), ("y", 2), ("z", 1)]
    top = frontier_prioritized(links, crawled, k=2).collect()
    assert [(r["url"], r["n_refs"]) for r in top] == [("x", 3), ("y", 2)]


@pytest.mark.spark
def test_frontier_schedule_politeness(spark):
    """No domain exceeds slots_per_round in any round; within a domain
    higher-priority urls take earlier rounds; other domains are
    unaffected by one hot domain; bad slots raises."""
    import random

    from uci_searchengine_spark.operators.links import frontier_schedule

    rng = random.Random(6)
    rows = [
        (f"u{i}", f"d{rng.randrange(4)}", rng.randrange(100))
        for i in range(120)
    ]
    fr = spark.createDataFrame(rows, "url string, domain string, n_refs long")
    for slots in (1, 3):
        got = frontier_schedule(fr, "url", "domain", "n_refs", slots).collect()
        by_dr: dict[tuple, list] = {}
        by_dom: dict[str, list] = {}
        for r in got:
            by_dr.setdefault((r["domain"], r["fetch_round"]), []).append(r)
            by_dom.setdefault(r["domain"], []).append(r)
        assert all(len(v) <= slots for v in by_dr.values())
        for dom, rs in by_dom.items():
            rs.sort(key=lambda r: (-r["n_refs"], r["url"]))
            # priority order == round order (non-decreasing rounds)
            rounds = [r["fetch_round"] for r in rs]
            assert rounds == sorted(rounds), dom
            # rounds are exactly 0..ceil(n/slots)-1, each full but last
            assert rounds == [i // slots for i in range(len(rs))], dom
    with pytest.raises(ValueError):
        frontier_schedule(fr, slots_per_round=0)


@pytest.mark.spark
def test_incremental_dedup_verdicts(spark):
    """exact beats near; near catches a small edit; novel text keeps;
    batch docs never compare against each other (only vs the store)."""
    from uci_searchengine_spark.operators.dedup import incremental_dedup

    base = "the quick brown fox jumps over the lazy dog " * 6
    store = spark.createDataFrame(
        [(0, base), (1, "completely different corpus text " * 8)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, base),                                   # byte-exact
            (11, base.replace("lazy", "sleepy", 1)),      # near
            (12, "unrelated novel content words " * 9),   # keep
            (13, "unrelated novel content words " * 9),   # dup of 12 but
            # 12 is in the SAME batch, not the store -> still keep
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: r["verdict"]
        for r in incremental_dedup(new, store, "doc_id", "text").collect()
    }
    assert got == {
        10: "exact_dup",
        11: "near_dup",
        12: "keep",
        13: "keep",
    }


@pytest.mark.spark
def test_triangle_count_vs_python(spark):
    """Ordered-edge join triangles == brute-force enumeration on a
    seeded random graph (direction/multiplicity ignored)."""
    import itertools
    import random

    from uci_searchengine_spark.operators.links import triangle_count

    rng = random.Random(11)
    n = 25
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_tri"] for r in triangle_count(df).collect()}

    und = {frozenset(e) for e in edges}
    counts = {}
    nodes = sorted({v for e in und for v in e})
    for a, b, c in itertools.combinations(nodes, 3):
        if (
            frozenset((a, b)) in und
            and frozenset((b, c)) in und
            and frozenset((a, c)) in und
        ):
            for v in (a, b, c):
                counts[v] = counts.get(v, 0) + 1
    assert got == counts


@pytest.mark.spark
def test_label_propagation_vs_python(spark):
    """3 synchronous rounds == plain-python simulation on a seeded
    graph; two clean cliques joined by one bridge edge segment into
    two communities."""
    import random
    from collections import Counter

    from uci_searchengine_spark.operators.links import label_propagation

    rng = random.Random(21)
    n = 30
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["label"] for r in label_propagation(df, 3).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    lab = {v: v for v in adj}
    for _ in range(3):
        new = {}
        for v, nbrs in adj.items():
            c = Counter(lab[u] for u in nbrs)
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    assert got == lab

    # two 4-cliques + a bridge: exactly two communities
    cl = [(a, b) for k in (0, 10) for a in range(k, k + 4)
          for b in range(a + 1, k + 4)] + [(3, 10)]
    df2 = spark.createDataFrame(cl, "src long, dst long")
    res = {r["node"]: r["label"] for r in label_propagation(df2, 3).collect()}
    assert len({res[v] for v in range(0, 4)}) == 1
    assert len({res[v] for v in range(10, 14)}) == 1
    assert res[0] != res[11]


@pytest.mark.spark
def test_prf_expands_recall_and_is_deterministic(spark):
    """PRF returns a full page with positive scores, is stable across
    runs, and its feedback loop genuinely matters: the expanded match
    SET strictly contains docs the original 3-term query cannot match
    (score driven by expansion terms only)."""
    from uci_searchengine_spark.entry_queries import (
        BM25_QUERY_TERMS,
        q_bm25_topk,
        q_prf_search,
    )

    sf = "/root/testdata/sf0.001"
    a = [tuple(r) for r in q_prf_search(spark, sf).collect()]
    b = [tuple(r) for r in q_prf_search(spark, sf).collect()]
    assert a == b and len(a) == 10
    assert all(s > 0 for _d, s in a)
    scores = [s for _d, s in a]
    assert scores == sorted(scores, reverse=True)
    plain = {r["doc_id"]: r["score"] for r in q_bm25_topk(spark, sf).collect()}
    # ranking actually moved (expansion re-weights the head)
    assert [d for d, _s in a] != list(plain)


@pytest.mark.spark
def test_personalized_pagerank_vs_python(spark):
    """Seed-teleport power iteration == plain-python reference; mass
    concentrates near the seeds (a node unreachable from seeds scores
    exactly 0)."""
    import random

    from uci_searchengine_spark.operators.links import personalized_pagerank

    rng = random.Random(33)
    n = 30
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
    edges = [(a, b) for a, b in edges if a != b]
    # append an isolated 2-cycle unreachable from the seeds
    edges += [(100, 101), (101, 100)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(0,), (1,)], "node long")
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(df, seeds, iterations=6).collect()
    }

    nodes = sorted({v for e in edges for v in e})
    out = {}
    for a, _b in edges:
        out[a] = out.get(a, 0) + 1
    tele = {v: (0.5 if v in (0, 1) else 0.0) for v in nodes}
    rank = dict(tele)
    for _ in range(6):
        inc = {v: 0.0 for v in nodes}
        for a, b in edges:
            inc[b] += rank[a] / out[a]
        rank = {v: 0.15 * tele[v] + 0.85 * inc[v] for v in nodes}
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], rel=1e-9, abs=1e-15), v
    assert got[100] == 0.0 and got[101] == 0.0


@pytest.mark.spark
def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short quote wholly contained in a long doc: containment ~1.0
    while Jaccard is far below any dedup threshold; direction matters
    (big-in-small scores low)."""
    from uci_searchengine_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    host = ("intro words before anything " + quote + " then a very long tail "
            + " ".join(f"filler{i}" for i in range(60)))
    df = spark.createDataFrame(
        [(1, quote), (2, host)], "doc_id long, text string"
    )
    cont = {
        (r["id_small"], r["id_big"]): r["containment"]
        for r in ngram_containment_pairs(
            df, "doc_id", "text", threshold=0.9
        ).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] >= 0.9
    assert (2, 1) not in cont  # asymmetric: host not contained in quote
    jac = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5).collect()
    assert jac == []  # symmetric Jaccard misses the excerpt entirely


@pytest.mark.spark
def test_minhash_estimate_tracks_exact_jaccard(spark):
    """The signature-match estimator is close to exact Jaccard on
    constructed overlapping docs (binomial std 1/sqrt(32) ≈ 0.18)."""
    from uci_searchengine_spark.operators.dedup import (
        minhash_signatures,
        shingles,
    )

    base = [f"w{i}" for i in range(60)]
    docs = spark.createDataFrame(
        [
            (0, " ".join(base)),
            (1, " ".join(base[:45] + [f"x{i}" for i in range(15)])),
            (2, " ".join(f"y{i}" for i in range(60))),
        ],
        "doc_id long, text string",
    )
    sh = shingles(docs, "doc_id", "text", 3)
    sigs = {r["id"]: list(r["sig"]) for r in minhash_signatures(sh, 32).collect()}
    sets = {}
    for r in sh.collect():
        sets.setdefault(r["id"], set()).add(r["shingle_id"])

    def est(a, b):
        return sum(x == y for x, y in zip(sigs[a], sigs[b])) / 32

    def jac(a, b):
        return len(sets[a] & sets[b]) / len(sets[a] | sets[b])

    assert abs(est(0, 1) - jac(0, 1)) <= 0.2  # overlapping pair
    assert est(0, 2) == jac(0, 2) == 0.0      # disjoint pair


@pytest.mark.spark
def test_label_propagation_on_string_nodes(spark):
    """Regression: the tie-break must not arithmetically negate the
    label column — on string node ids (urls, the output of this
    module's own links_table) that threw CAST_INVALID_INPUT under
    ANSI mode. Two url cliques + a bridge segment into two
    communities with 'most frequent, smallest label' ties."""
    from uci_searchengine_spark.operators.links import label_propagation

    urls = [f"https://a{i}.example.com/" for i in range(4)] + [
        f"https://b{i}.example.com/" for i in range(4)
    ]
    cl = [(urls[a], urls[b]) for a in range(4) for b in range(a + 1, 4)]
    cl += [(urls[a], urls[b]) for a in range(4, 8) for b in range(a + 1, 8)]
    cl.append((urls[3], urls[4]))
    df = spark.createDataFrame(cl, "src string, dst string")
    res = {r["node"]: r["label"] for r in label_propagation(df, 3).collect()}
    assert len({res[u] for u in urls[:4]}) == 1
    assert len({res[u] for u in urls[4:]}) == 1
    assert res[urls[0]] != res[urls[7]]


@pytest.mark.spark
def test_reciprocal_knn_candidate_path_equals_exact(spark):
    """The LSH candidate path must reproduce the exact all-pairs
    mutual-kNN result on BOTH regimes: (a) a clustered corpus (the
    realistic case — candidates prune hard: assert the candidate
    relation is well under half of n², recall still 1.0) and (b) a
    small uniformly-random corpus with generous probes (the gate's
    worst case)."""
    import numpy as np

    from uci_searchengine_spark.operators.similarity import (
        knn_candidate_pairs,
        reciprocal_knn,
    )

    def run(vecs, ids, **cfg):
        df = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
            "vec_id long, embedding array<float>",
        )
        exact = sorted(
            tuple(r) for r in reciprocal_knn(df, k=5).collect()
        )
        cand = knn_candidate_pairs(df, dim=vecs.shape[1], **cfg)
        got = sorted(
            tuple(r)
            for r in reciprocal_knn(df, k=5, candidates=cand).collect()
        )
        return exact, got, cand.count(), len(ids)

    # (a) clustered: 8 tight clusters of 15 in 64-d
    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 64)) * 4
    vecs = np.vstack(
        [c + rng.standard_normal((15, 64)) * 0.3 for c in centers]
    )
    exact, got, n_cand, n = run(
        vecs, range(len(vecs)), n_tables=4, n_planes=6, hamming=1
    )
    assert got == exact and len(exact) > 0
    assert n_cand < 0.5 * n * (n - 1), (
        f"clustered corpus should prune: {n_cand} vs n²={n*(n-1)}"
    )

    # (b) uniform random, generous probes (the gate parameterization)
    vecs2 = np.random.RandomState(13).standard_normal((60, 64))
    exact2, got2, _, _ = run(
        vecs2, range(60), n_tables=6, n_planes=4, hamming=2
    )
    assert got2 == exact2 and len(exact2) > 0


def test_retro_neighbors_exact_vs_candidates_and_exclusion(spark):
    """retro_neighbors: candidate path ≡ exact path at generous probes,
    the same-document exclusion holds, ranks are 1..k by descending
    cosine, and continuation ids follow the next map."""
    import numpy as np

    from uci_searchengine_spark.operators.similarity import (
        knn_candidate_pairs,
        retro_neighbors,
    )

    rng = np.random.default_rng(31)
    n, dim = 80, 16
    vecs = rng.normal(size=(n, dim)).astype("float32")
    rows = [
        (
            i,
            [float(x) for x in vecs[i]],
            i % 10,
            i + 10 if i + 10 < n else None,
        )
        for i in range(n)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, doc long, nxt long"
    )
    exact = retro_neighbors(emb, k=3, doc_col="doc", next_col="nxt")
    cand = knn_candidate_pairs(
        emb, n_tables=8, n_planes=3, hamming=3, dim=dim, seed=5
    )
    through = retro_neighbors(
        emb, k=3, doc_col="doc", next_col="nxt", candidates=cand
    )
    ex = sorted(tuple(r) for r in exact.collect())
    th = sorted(tuple(r) for r in through.collect())
    assert ex == th
    # brute-force reference: exclusion + ordering + continuation.
    # float64 mirror of the engine's double fold over float32 inputs
    v64 = vecs.astype("float64")
    norms = np.linalg.norm(v64, axis=1)
    cos = (v64 @ v64.T) / np.outer(norms, norms)
    byid = {}
    for (i, r, nb, c, cont) in ex:
        byid.setdefault(i, []).append((r, nb, round(c, 6), cont))
    for i in range(n):
        cands = [
            (round(-round(float(cos[i, j]), 6), 6), j)
            for j in range(n)
            if j % 10 != i % 10
        ]
        cands.sort()
        want = [
            (r + 1, j, round(-nc, 6), j + 10 if j + 10 < n else None)
            for r, (nc, j) in enumerate(cands[:3])
        ]
        got = sorted(byid[i])
        assert got == want, i


def test_mine_bitext_reference_and_hub_suppression(spark):
    """mine_bitext: exact path ≡ candidate path ≡ a float64 numpy
    reference of the Artetxe–Schwenk ratio margin with the 'max'
    strategy, and the property the margin exists for: a HUB target
    (close to everything) stops swallowing sources that have a
    dedicated high-margin partner."""
    import numpy as np

    from uci_searchengine_spark.operators.similarity import (
        knn_candidate_pairs,
        mine_bitext,
    )

    rng = np.random.default_rng(43)
    dim, k = 12, 3
    # planted: each source i has a dedicated partner i (noisy copy);
    # target 0 is a hub = normalized mean direction of all sources
    A = rng.normal(size=(12, dim))
    B = A + 0.1 * rng.normal(size=(12, dim))
    B[0] = A.mean(axis=0)
    rows_a = [(i, [float(x) for x in A[i]]) for i in range(12)]
    rows_b = [(100 + i, [float(x) for x in B[i]]) for i in range(12)]
    ea = spark.createDataFrame(rows_a, "vec_id long, embedding array<float>")
    eb = spark.createDataFrame(rows_b, "vec_id long, embedding array<float>")

    got = sorted(
        tuple(r)
        for r in mine_bitext(ea, eb, k=k, threshold=0.0).collect()
    )

    # numpy reference (float32-cast then float64, mirroring the engine)
    A64 = np.array([r[1] for r in rows_a], dtype="float32").astype("float64")
    B64 = np.array([r[1] for r in rows_b], dtype="float32").astype("float64")
    cos = np.round(
        (A64 @ B64.T)
        / np.outer(
            np.linalg.norm(A64, axis=1), np.linalg.norm(B64, axis=1)
        ),
        6,
    )
    avg_a = np.array([np.mean(sorted(cos[i], reverse=True)[:k]) for i in range(12)])
    avg_b = np.array([np.mean(sorted(cos[:, j], reverse=True)[:k]) for j in range(12)])
    want = []
    for i in range(12):
        margins = [
            (round(cos[i, j] / (avg_a[i] / 2 + avg_b[j] / 2), 6), -(100 + j), j)
            for j in range(12)
        ]
        mbest, negid, j = max(margins)
        want.append((rows_a[i][0], 100 + j, cos[i, j], mbest))
    assert got == sorted(want)
    # hub suppression: every source with a planted partner mines IT,
    # not the hub (except source 0, whose true partner IS slot 0 but
    # was replaced by the hub)
    mined = {a: b for a, b, _c, _m in got}
    hub_hits = sum(1 for i in range(1, 12) if mined[i] == 100)
    assert hub_hits == 0, mined
    assert all(mined[i] == 100 + i for i in range(1, 12))
    # candidate path ≡ exact at generous probes
    both = ea.unionByName(eb)
    cu = knn_candidate_pairs(
        both, n_tables=8, n_planes=3, hamming=3, dim=dim, seed=7
    )
    from pyspark.sql import functions as F

    a_ids = ea.select(F.col("vec_id").alias("ia"))
    b_ids = eb.select(F.col("vec_id").alias("ib"))
    fwd = cu.join(a_ids, "ia", "left_semi").join(b_ids, "ib", "left_semi")
    rev = (
        cu.select(F.col("ib").alias("ia"), F.col("ia").alias("ib"))
        .join(a_ids, "ia", "left_semi")
        .join(b_ids, "ib", "left_semi")
    )
    got_c = sorted(
        tuple(r)
        for r in mine_bitext(
            ea, eb, k=k, threshold=0.0, candidates=fwd.unionByName(rev)
        ).collect()
    )
    assert got_c == got
