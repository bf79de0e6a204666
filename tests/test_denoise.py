"""T5 span corruption (operators/denoise): Spark fold ≡ python
reference on random docs, the reconstruction invariant (input +
target re-zip to the original tokens), rate edge cases, determinism
across partitionings, and the zero-shuffle zero-Python plan shape."""

import hashlib
import random
import re

import pytest
from pyspark.sql import functions as F

from uci_searchengine_spark.operators.denoise import (
    MASK_RATE,
    SALT,
    denoiser_prep,
)


def _masked(doc_id, i, rate=MASK_RATE, salt=SALT):
    key = f"{doc_id}|{i}:{salt}"
    u = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2**32
    return u < rate


def _ref(doc_id, toks, rate=MASK_RATE):
    inp, tgt, k, in_span, nm = [], [], 0, False, 0
    for i, t in enumerate(toks):
        if not _masked(doc_id, i, rate):
            inp.append(t)
            in_span = False
        elif in_span:
            tgt.append(t)
            nm += 1
        else:
            sent = f"<extra_id_{k}>"
            inp.append(sent)
            tgt.extend([sent, t])
            k += 1
            in_span = True
            nm += 1
    return (" ".join(inp), " ".join(tgt), k, nm)


def _rand_docs(rng, n=40, maxlen=60):
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    return [
        (
            i,
            [rng.choice(words) for _ in range(rng.randrange(0, maxlen))],
        )
        for i in range(n)
    ]


def _reconstruct(input_text, target_text):
    """Invariant: substituting each sentinel in the input with its
    target span recovers the original token stream."""
    spans = {}
    parts = re.split(r"(<extra_id_\d+>)", target_text)
    cur = None
    for p in parts:
        p = p.strip()
        if not p:
            continue
        if re.fullmatch(r"<extra_id_\d+>", p):
            cur = p
            spans[cur] = []
        elif cur is not None:
            spans[cur].extend(p.split())
    out = []
    for tok in input_text.split():
        if re.fullmatch(r"<extra_id_\d+>", tok):
            out.extend(spans.get(tok, []))
        else:
            out.append(tok)
    return out


@pytest.mark.spark
class TestSpanCorruption:
    def test_equals_python_reference(self, spark):
        rng = random.Random(4)
        docs = _rand_docs(rng)
        df = spark.createDataFrame(docs, "doc_id long, t array<string>")
        got = {
            r["doc_id"]: (
                r["input_text"],
                r["target_text"],
                r["n_spans"],
                r["n_masked"],
            )
            for r in denoiser_prep(df).collect()
        }
        for doc_id, toks in docs:
            assert got[doc_id] == _ref(doc_id, toks), doc_id

    def test_reconstruction_invariant(self, spark):
        rng = random.Random(8)
        docs = _rand_docs(rng, n=30)
        df = spark.createDataFrame(docs, "doc_id long, t array<string>")
        rows = {r["doc_id"]: r for r in denoiser_prep(df, rate=0.4).collect()}
        for doc_id, toks in docs:
            r = rows[doc_id]
            assert _reconstruct(r["input_text"], r["target_text"]) == toks

    def test_rate_edges(self, spark):
        toks = ["a", "b", "c", "d"]
        df = spark.createDataFrame([(7, toks)], "doc_id long, t array<string>")
        r0 = denoiser_prep(df, rate=0.0).collect()[0]
        assert (r0["input_text"], r0["target_text"], r0["n_spans"]) == (
            "a b c d",
            "",
            0,
        )
        r1 = denoiser_prep(df, rate=1.0).collect()[0]
        assert r1["input_text"] == "<extra_id_0>"
        assert r1["target_text"] == "<extra_id_0> a b c d"
        assert (r1["n_spans"], r1["n_masked"]) == (1, 4)

    def test_empty_and_single(self, spark):
        df = spark.createDataFrame(
            [(1, []), (2, ["x"])], "doc_id long, t array<string>"
        )
        got = {r["doc_id"]: tuple(r)[1:] for r in denoiser_prep(df).collect()}
        assert got[1] == ("", "", 0, 0)
        it, tt, ns, nm = got[2]
        assert (it, tt) in (("x", ""), ("<extra_id_0>", "<extra_id_0> x"))
        assert ns in (0, 1) and nm == ns

    def test_partition_invariance(self, spark):
        rng = random.Random(2)
        docs = _rand_docs(rng, n=25)
        df = spark.createDataFrame(docs, "doc_id long, t array<string>")
        a = sorted(map(tuple, denoiser_prep(df).collect()))
        b = sorted(map(tuple, denoiser_prep(df.repartition(9)).collect()))
        assert a == b

    def test_plan_zero_shuffle_zero_python(self, spark):
        df = spark.createDataFrame(
            [(1, ["a", "b"])], "doc_id long, t array<string>"
        )
        out = denoiser_prep(df)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "Generate" not in plan  # no explode — pure in-row fold


def _u_hash(doc_id, i, salt):
    key = f"{doc_id}|{i}:{salt}"
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) / 2**32


def _mlm_ref(doc_id, toks, rate=0.15, salt="mlm"):
    out, labels, nm = [], [], 0
    n = len(toks)
    for i, t in enumerate(toks):
        if _u_hash(doc_id, i, f"{salt}:sel") >= rate:
            out.append(t)
            continue
        nm += 1
        labels.append(f"{i}:{t}")
        ua = _u_hash(doc_id, i, f"{salt}:act")
        if ua < 0.8:
            out.append("[MASK]")
        elif ua < 0.9:
            ur = _u_hash(doc_id, i, f"{salt}:rep")
            out.append(toks[int(ur * n)])
        else:
            out.append(t)
    return (" ".join(out), " ".join(labels), nm)


@pytest.mark.spark
class TestMlmCorruption:
    def test_equals_python_reference(self, spark):
        from uci_searchengine_spark.operators.denoise import mlm_prep

        rng = random.Random(17)
        docs = _rand_docs(rng, n=40)
        df = spark.createDataFrame(docs, "doc_id long, t array<string>")
        got = {
            r["doc_id"]: (r["masked_text"], r["labels_text"], r["n_masked"])
            for r in mlm_prep(df).collect()
        }
        for doc_id, toks in docs:
            assert got[doc_id] == _mlm_ref(doc_id, toks), doc_id

    def test_action_mix_and_positions(self, spark):
        """Across many selected positions the 80/10/10 split shows up,
        every label names a selected position, and unselected positions
        are untouched."""
        from uci_searchengine_spark.operators.denoise import mlm_prep

        toks = [f"w{i:03d}" for i in range(400)]
        df = spark.createDataFrame([(5, toks)], "doc_id long, t array<string>")
        r = mlm_prep(df, rate=0.5).collect()[0]
        out = r["masked_text"].split()
        labels = dict(
            (int(p.split(":")[0]), p.split(":")[1])
            for p in r["labels_text"].split()
        )
        assert len(out) == len(toks)
        assert r["n_masked"] == len(labels)
        n_mask = sum(1 for t in out if t == "[MASK]")
        # ~80% of ~200 selected — loose 4-sigma band
        assert 120 < n_mask < 200
        for i, t in enumerate(toks):
            if i not in labels:
                assert out[i] == t, i  # unselected: untouched
            else:
                assert labels[i] == t  # label is the original
        # some selected positions kept their token (the 10% unchanged)
        assert any(out[i] == t for i, t in enumerate(toks) if i in labels)
        # some got a random replacement (not [MASK], not original)
        assert any(
            out[i] not in ("[MASK]", t)
            for i, t in enumerate(toks)
            if i in labels
        )

    def test_empty_doc(self, spark):
        from uci_searchengine_spark.operators.denoise import mlm_prep

        df = spark.createDataFrame([(1, [])], "doc_id long, t array<string>")
        r = mlm_prep(df).collect()[0]
        assert tuple(r)[1:] == ("", "", 0)


# ------------------------------------------------------------- UL2 mix
from uci_searchengine_spark.operators.denoise import (  # noqa: E402
    UL2_MODE_SALT,
    UL2_R_RATE,
    UL2_R_SALT,
    UL2_S_SALT,
    UL2_X_RATE,
    UL2_X_SALT,
    ul2_prep,
)


def _uhash(key, salt):
    u = int(
        hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:8], 16
    ) / 2**32
    return u


def _ul2_ref(doc_id, toks):
    um = _uhash(doc_id, UL2_MODE_SALT)
    mode = "[R]" if um < 1 / 3 else ("[X]" if um < 2 / 3 else "[S]")
    if mode == "[R]":
        inp, tgt = _span_ref_salted(doc_id, toks, UL2_R_RATE, UL2_R_SALT)
    elif mode == "[X]":
        inp, tgt = _span_ref_salted(doc_id, toks, UL2_X_RATE, UL2_X_SALT)
    else:
        n = len(toks)
        k = 1 + int(_uhash(doc_id, UL2_S_SALT) * (n - 1)) if n >= 2 else n
        inp = " ".join(toks[:k] + ["<extra_id_0>"])
        tgt = " ".join(["<extra_id_0>"] + toks[k:])
    return mode, f"{mode} {inp}", tgt


def _span_ref_salted(doc_id, toks, rate, salt):
    inp, tgt, k, in_span = [], [], 0, False
    for i, t in enumerate(toks):
        if not _masked(doc_id, i, rate, salt=salt):
            inp.append(t)
            in_span = False
        elif in_span:
            tgt.append(t)
        else:
            sent = f"<extra_id_{k}>"
            inp.append(sent)
            tgt.extend([sent, t])
            k += 1
            in_span = True
    return " ".join(inp), " ".join(tgt)


class TestUL2:
    def test_equals_python_reference(self, spark):
        rng = random.Random(11)
        docs = _rand_docs(rng, n=60)
        df = spark.createDataFrame(
            docs, "doc_id long, t array<string>"
        )
        got = {
            r["doc_id"]: (r["mode"], r["input_text"], r["target_text"])
            for r in ul2_prep(df).collect()
        }
        want = {i: _ul2_ref(i, t) for i, t in docs}
        assert got == want
        # all three paradigms exercised on 60 random docs
        assert {m for m, _, _ in got.values()} == {"[R]", "[X]", "[S]"}

    def test_s_split_properties(self, spark):
        """S docs: input ends with the sentinel, target starts with it,
        both sides nonempty for len >= 2, and the token stream is
        preserved by concatenation."""
        rng = random.Random(13)
        docs = [(i, t) for i, t in _rand_docs(rng, n=80) if len(t) >= 2]
        df = spark.createDataFrame(docs, "doc_id long, t array<string>")
        rows = [r for r in ul2_prep(df).collect() if r["mode"] == "[S]"]
        assert rows
        byid = dict(docs)
        for r in rows:
            assert r["input_text"].endswith("<extra_id_0>")
            assert r["target_text"].startswith("<extra_id_0>")
            head = r["input_text"].split()[1:-1]  # strip mode + sentinel
            tail = r["target_text"].split()[1:]
            assert head and tail  # K in [1, len-1]
            assert head + tail == byid[r["doc_id"]]

    def test_rx_reconstruction(self, spark):
        """R and X docs still satisfy the span-fold reconstruction
        invariant (mode token stripped first)."""
        rng = random.Random(17)
        docs = _rand_docs(rng, n=60)
        df = spark.createDataFrame(docs, "doc_id long, t array<string>")
        byid = dict(docs)
        n_checked = 0
        for r in ul2_prep(df).collect():
            if r["mode"] == "[S]":
                continue
            inp = r["input_text"][4:]  # strip "[R] " / "[X] "
            assert _reconstruct(inp, r["target_text"]) == byid[r["doc_id"]]
            n_checked += 1
        assert n_checked > 10

    def test_plan_is_scan_projection(self, spark):
        df = spark.createDataFrame(
            [(1, ["a", "b", "c"])], "doc_id long, t array<string>"
        )
        out = ul2_prep(df)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


# --------------------------------------------------------------- FIM
from uci_searchengine_spark.operators.denoise import (  # noqa: E402
    FIM_C1_SALT,
    FIM_C2_SALT,
    FIM_SEL_SALT,
    fim_prep,
)


def _fim_ref(doc_id, text, rate=0.5, mode="psm"):
    if _uhash(doc_id, FIM_SEL_SALT) >= rate:
        return False, text
    n = len(text)
    c1 = int(_uhash(doc_id, FIM_C1_SALT) * (n + 1))
    c2 = int(_uhash(doc_id, FIM_C2_SALT) * (n + 1))
    lo, hi = min(c1, c2), max(c1, c2)
    p, m, s = text[:lo], text[lo:hi], text[hi:]
    if mode == "psm":
        return True, f"<PRE>{p}<SUF>{s}<MID>{m}"
    return True, f"<SUF>{s}<PRE>{p}<MID>{m}"


class TestFIM:
    def test_equals_python_reference_both_modes(self, spark):
        rng = random.Random(19)
        docs = [
            (i, "".join(rng.choice("abcdef gh") for _ in range(rng.randrange(0, 40))))
            for i in range(80)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        for mode in ("psm", "spm"):
            got = {
                r["doc_id"]: (r["fim_applied"], r["output_text"])
                for r in fim_prep(df, mode=mode).collect()
            }
            want = {i: _fim_ref(i, t, mode=mode) for i, t in docs}
            assert got == want, mode
        # both populations present
        applied = [v for v, _ in got.values()]
        assert any(applied) and not all(applied)

    def test_reconstruction(self, spark):
        """PSM output reassembles to the original: prefix + middle +
        suffix recovered from the sentinel layout."""
        rng = random.Random(21)
        docs = [(i, "x" * 0 if i == 0 else "".join(rng.choice("pqrs")
                 for _ in range(rng.randrange(1, 30)))) for i in range(40)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        byid = dict(docs)
        for r in fim_prep(df, rate=1.0).collect():
            assert r["fim_applied"]
            out = r["output_text"]
            assert out.startswith("<PRE>")
            p, rest = out[5:].split("<SUF>", 1)
            s, m = rest.split("<MID>", 1)
            assert p + m + s == byid[r["doc_id"]]

    def test_rate_edges_and_guard(self, spark):
        df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
        assert fim_prep(df, rate=0.0).collect()[0]["output_text"] == "hello"
        assert not fim_prep(df, rate=0.0).collect()[0]["fim_applied"]
        with pytest.raises(ValueError):
            fim_prep(df, mode="mps")

    def test_plan_scan_projection(self, spark):
        df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
        out = fim_prep(df)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan and "BatchEvalPython" not in plan
