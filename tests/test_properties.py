"""Property-based pins: differential tests against reference semantics.

1. Date extraction: hypothesis-generated filenames checked against a
   pure-Python reimplementation of the reference's strategy cascade
   (build-stac/utils/regex.py:30-83).
2. MinHash/LSH recall: every truly-high-Jaccard pair must surface as a
   candidate (banding guarantee, probabilistic but overwhelming at 0.9+).
3. SimHash completeness: the piece-blocking join must find EVERY pair
   within the Hamming radius (pigeonhole — exact, not probabilistic).
"""

from __future__ import annotations

import datetime as dt
import itertools
import random
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# --- pure-Python reference reimplementation (regex.py:30-83) --------------

_STRATEGIES = [
    (r"(?:_|-)(\d{4}-\d{2}-\d{2})", "%Y-%m-%d"),
    (r"(?:_|-)(\d{8})", "%Y%m%d"),
    (r"(?:_|-)(\d{6})", "%Y%m"),
    (r"(?:_|-)(\d{4})", "%Y"),
]


def _py_extract(filename: str) -> list[dt.date]:
    for pattern, fmt in _STRATEGIES:
        found = re.compile(pattern).findall(filename)
        if not found:
            continue
        out = []
        for s in found:
            try:
                out.append(dt.datetime.strptime(s, fmt).date())
            except ValueError:
                out.append(None)  # Spark to_date yields NULL here
        return out
    return []


_WORD = st.from_regex(r"[a-z]{1,6}", fullmatch=True)
_DATE = st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2099, 12, 28))
_TOKEN = st.one_of(
    _WORD,
    _DATE.map(lambda d: d.strftime("%Y-%m-%d")),
    _DATE.map(lambda d: d.strftime("%Y%m%d")),
    _DATE.map(lambda d: d.strftime("%Y%m")),
    _DATE.map(lambda d: d.strftime("%Y")),
    st.integers(min_value=0, max_value=999).map(str),
)


@st.composite
def _filenames(draw):
    tokens = draw(st.lists(_TOKEN, min_size=1, max_size=5))
    seps = [draw(st.sampled_from(["_", "-", "."])) for _ in tokens]
    body = "".join(s + t for s, t in zip(seps, tokens))
    return f"s3://bucket/prefix/file{body}.tif"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_filenames())
def test_extracted_dates_matches_reference_python(spark, filename):
    from maap_data_pipelines_spark.functions.dates import extracted_dates

    got = (
        spark.createDataFrame([(filename,)], ["fn"])
        .select(extracted_dates(F.col("fn")).alias("d"))
        .collect()[0]
        .d
    )
    assert got == _py_extract(filename), filename


# --- MinHash recall (probabilistic guarantee at 16 bands x 4 rows) --------


def _random_corpus(n_docs=40, seed=7):
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(60)]
    docs = []
    for i in range(n_docs):
        base = [rng.choice(vocab) for _ in range(30)]
        docs.append((i, " ".join(base)))
        if i % 4 == 0:  # plant a near-dup: mutate one word
            mutated = list(base)
            mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            docs.append((1000 + i, " ".join(mutated)))
    return docs


def _true_jaccard(a: str, b: str) -> float:
    def sh(t):
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb)


def test_minhash_recalls_high_jaccard_pairs(spark):
    from maap_data_pipelines_spark.operators.dedup import dedup_minhash_lsh

    docs = _random_corpus()
    truth = {
        (min(i, j), max(i, j))
        for (i, ta), (j, tb) in itertools.combinations(docs, 2)
        if _true_jaccard(ta, tb) >= 0.85
    }
    assert truth  # the corpus really has planted near-dups
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    found = {
        (r.doc_a, r.doc_b) for r in dedup_minhash_lsh(df).collect()
    }
    missed = truth - found
    assert not missed, f"LSH missed high-similarity pairs: {missed}"


def test_simhash_blocking_is_complete(spark):
    from maap_data_pipelines_spark.operators.dedup import (
        SIMHASH_MAX_HAMMING,
        _simhash_fp,
        dedup_simhash,
    )

    docs = _random_corpus(n_docs=30, seed=13)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    fps = {r.doc_id: r.fp for r in _simhash_fp(df).collect()}
    truth = {
        (min(i, j), max(i, j))
        for i, j in itertools.combinations(fps, 2)
        if bin(fps[i] ^ fps[j]).count("1") <= SIMHASH_MAX_HAMMING
    }
    found = {(r.doc_a, r.doc_b) for r in dedup_simhash(df).collect()}
    assert found == truth  # pigeonhole: exact, no misses AND no extras


# --- z-order key: pure-Python differential + structural properties --------


def _py_zorder(a: int, b: int) -> int:
    z = 0
    for i in range(16):
        z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
    return z


@settings(deadline=None, max_examples=20, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=0xFFFF),
            st.integers(min_value=0, max_value=0xFFFF),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_zorder_key_matches_per_bit_reference(spark, pairs):
    from maap_data_pipelines_spark.functions.zorder import zorder_key

    df = spark.createDataFrame(pairs, ["a", "b"]).select(
        "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r.z == _py_zorder(r.a, r.b)


def test_pack_assign_partitions_token_stream(spark):
    # invariant: within a source, packs tile the concatenated token stream:
    # doc k's cum_before == sum of previous docs' n_tokens, and pack_id is
    # nondecreasing in doc order
    from maap_data_pipelines_spark.operators.curation import doc_pack_assign

    random.seed(7)
    rows = [
        (i, " ".join(["w"] * random.randint(1, 300)), "en", f"src{i % 3}")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = sorted(
        doc_pack_assign(df).collect(), key=lambda r: (r.source, r.doc_id)
    )
    for src in {r.source for r in out}:
        docs = [r for r in out if r.source == src]
        cum = 0
        prev_pack = 0
        for r in docs:
            assert r.cum_before == cum
            assert r.pack_id == cum // 256
            assert r.pack_id >= prev_pack
            cum += r.n_tokens
            prev_pack = r.pack_id


def test_rebalance_copies_bounded_by_factor(spark):
    # n_copies is always floor(factor) or ceil(factor)
    from maap_data_pipelines_spark.operators.curation import (
        domain_mixture,
        domain_rebalance,
    )

    random.seed(11)
    rows = [
        (i, " ".join(["w"] * random.randint(1, 40)), "en", f"src{i % 4}")
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    factors = {r.source: r.sampling_factor for r in domain_mixture(df).collect()}
    copies = {}
    for r in domain_rebalance(df).collect():
        copies[r.doc_id] = max(copies.get(r.doc_id, 0), r.copy_idx)
        src = r.source
        f = factors[src]
        assert int(f) <= r.n_copies <= int(f) + 1


@settings(deadline=None, max_examples=15, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "ee", "ff", "g1", "g2"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=5),
)
def test_heavy_hitters_matches_exact_counting(spark, word_lists, nparts):
    """MG candidate pruning is lossless: output == exact HAVING count*K > n."""
    from collections import Counter

    from maap_data_pipelines_spark.operators.sketch import HH_K, heavy_hitters

    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(
        nparts
    )
    counts = Counter(w for ws in word_lists for w in ws)
    total = sum(counts.values())
    expected = {
        (w, c, total) for w, c in counts.items() if c * HH_K > total
    }
    got = {
        (r.term, r.n_occurrences, r.total) for r in heavy_hitters(docs).collect()
    }
    assert got == expected


@settings(deadline=None, max_examples=10, suppress_health_check=list(HealthCheck))
@given(
    st.sets(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=120),
    st.sets(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=120),
)
def test_bloom_membership_never_false_negative(spark, build_keys, probe_keys):
    """For ANY build/probe key sets: every true member reports maybe=True,
    and the counts decompose exactly."""
    from maap_data_pipelines_spark.operators.sketch import bloom_membership

    build = spark.createDataFrame([(k,) for k in build_keys], "k long")
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    r = bloom_membership(build, "k", probe, "k").collect()[0]
    inter = len(build_keys & probe_keys)
    assert r.n_probed == len(probe_keys)
    assert r.n_true == inter
    assert r.n_false_negative == 0
    assert r.n_maybe == r.n_true + r.n_false_positive


# --- PAV isotonic: minimax identity vs the classic sequential pooler ------


def _pav_sequential(cells: list[tuple[int, int]]) -> list[int]:
    """Reference PAV: pool-adjacent-violators over (n, k) cells in order;
    fitted value floored to ppm exactly as the operator documents."""
    blocks: list[list[int]] = []  # [n, k]
    for n, k in cells:
        blocks.append([n, k])
        # merge while the last block's rate is below its predecessor's
        while len(blocks) >= 2:
            n2, k2 = blocks[-1]
            n1, k1 = blocks[-2]
            if k2 * n1 < k1 * n2:  # exact rational compare
                blocks[-2] = [n1 + n2, k1 + k2]
                blocks.pop()
            else:
                break
    fitted = []
    for n, k in blocks:
        # each block spans as many input cells as its pooled n covers —
        # reconstruct by walking the inputs again
        fitted.append((n, (k * 1_000_000) // n))
    expanded = []
    i = 0
    for n, v in fitted:
        acc = 0
        while acc < n:
            acc += cells[i][0]
            expanded.append(v)
            i += 1
    return expanded


@settings(deadline=None, max_examples=12, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=40),  # n_docs
            st.integers(min_value=0, max_value=40),  # n_label_keep <= n
        ),
        min_size=1,
        max_size=8,
    )
)
def test_isotonic_minimax_equals_sequential_pav(spark, cells):
    """The operator's max-min-over-intervals formulation must agree with
    the classic sequential PAV (both in floored ppm) on arbitrary
    reliability frames — the minimax identity, executed distributed."""
    from maap_data_pipelines_spark.operators.curation import (
        isotonic_from_deciles,
    )

    cells = [(n, min(k, n)) for n, k in cells]
    df = spark.createDataFrame(
        [(i, n, k) for i, (n, k) in enumerate(cells)],
        "conf_decile bigint, n_docs bigint, n_label_keep bigint",
    )
    got = [
        r.calibrated_ppm
        for r in sorted(
            isotonic_from_deciles(df).collect(), key=lambda r: r.conf_decile
        )
    ]
    want = _pav_sequential(cells)
    assert got == want


@settings(deadline=None, max_examples=10, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200_000),  # pre cents
            st.integers(min_value=0, max_value=200_000),  # post cents
        ),
        min_size=4,
        max_size=40,
    )
)
def test_cuped_readout_matches_numpy(spark, users):
    """cuped_readout's theta/rho2/adjusted-lift over arbitrary per-user
    frames must match the straight numpy regression-adjustment formulas
    (floored at the documented quantizations) — the kernel is closed-form,
    so the agreement is exact, not approximate."""
    import math

    import numpy as np

    from maap_data_pipelines_spark.plans.events import cuped_readout

    df = spark.createDataFrame(
        [(i, p, q) for i, (p, q) in enumerate(users)],
        "user_id bigint, pre_cents bigint, post_cents bigint",
    )
    rows = cuped_readout(df).collect()
    assert len(rows) == 1
    r = rows[0]

    # replicate the md5 arm split
    import hashlib

    def arm(u: int) -> int:
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    arms = np.array([arm(i) for i in range(len(users))])
    x = np.array([p for p, _ in users], dtype=np.int64)
    y = np.array([q for _, q in users], dtype=np.int64)
    n = len(users)
    n_a, n_b = int((arms == 0).sum()), int((arms == 1).sum())
    assert (r.n_a, r.n_b) == (n_a, n_b)
    if n_a == 0 or n_b == 0:
        return  # degenerate split: means are NULL-guarded engine-side
    sx, sy = int(x.sum()), int(y.sum())
    sxx = int((x * x).sum())
    syy = int((y * y).sum())
    sxy = int((x * y).sum())
    varx = float(n) * sxx - float(sx) * sx
    cov = float(n) * sxy - float(sx) * sy
    vary = float(n) * syy - float(sy) * sy
    if varx != 0.0:
        theta = cov / varx
        assert r.theta_micro == math.floor(theta * 1_000_000)
        pre_a = int(x[arms == 0].sum()); pre_b = int(x[arms == 1].sum())
        post_a = int(y[arms == 0].sum()); post_b = int(y[arms == 1].sum())
        diff = (post_b / n_b - post_a / n_a) - theta * (
            pre_b / n_b - pre_a / n_a
        )
        assert r.diff_cuped_milli == math.floor(diff * 1000)
    if varx != 0.0 and vary != 0.0:
        assert r.rho2_ppm == math.floor(cov * cov / (varx * vary) * 1_000_000)


@settings(deadline=None, max_examples=15, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=2),  # sample width (bytes)
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400),
)
def test_wav_codec_roundtrip_property(width, samples):
    """Any PCM sample sequence survives encode->decode exactly through
    the stdlib WAV container (8-bit clamped to unsigned range)."""
    import io
    import wave

    import numpy as np

    from maap_data_pipelines_spark.operators.multimodal import decode_media

    if width == 1:
        samples = [s & 0xFF for s in samples]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(width)
        wf.setframerate(8000)
        if width == 1:
            wf.writeframes(bytes(samples))
        else:
            wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    arr = decode_media(buf.getvalue(), "audio/wav")
    assert arr.tolist() == samples


@settings(deadline=None, max_examples=8, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200_000),  # pre cents
            st.integers(min_value=0, max_value=200_000),  # post cents
        ),
        min_size=6,
        max_size=40,
    )
)
def test_cuped_stratified_readout_matches_numpy(spark, users):
    """Per-stratum CUPED over arbitrary per-user frames == the numpy
    regression-adjustment formulas applied within each digit-count
    stratum, NULL guards engaging exactly on the degenerate strata."""
    import hashlib
    import math

    import numpy as np

    from maap_data_pipelines_spark.plans.events import cuped_stratified_readout

    df = spark.createDataFrame(
        [(i, p, q) for i, (p, q) in enumerate(users)],
        "user_id bigint, pre_cents bigint, post_cents bigint",
    )
    got = {r.stratum: r for r in cuped_stratified_readout(df).collect()}

    def arm(u: int) -> int:
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    def stratum(pre: int) -> int:
        return 0 if pre <= 0 else len(str(pre))

    strata = sorted({stratum(p) for p, _ in users})
    assert sorted(got) == strata
    for s in strata:
        members = [
            (i, p, q) for i, (p, q) in enumerate(users) if stratum(p) == s
        ]
        arms = np.array([arm(i) for i, _, _ in members])
        x = np.array([p for _, p, _ in members], dtype=np.int64)
        y = np.array([q for _, _, q in members], dtype=np.int64)
        n = len(members)
        n_a, n_b = int((arms == 0).sum()), int((arms == 1).sum())
        r = got[s]
        assert (r.n_a, r.n_b) == (n_a, n_b)
        if n_a == 0 or n_b == 0:
            assert r.diff_raw_milli is None and r.diff_cuped_milli is None
            continue
        sx, sy = int(x.sum()), int(y.sum())
        varx = float(n) * int((x * x).sum()) - float(sx) * sx
        cov = float(n) * int((x * y).sum()) - float(sx) * sy
        vary = float(n) * int((y * y).sum()) - float(sy) * sy
        post_a = int(y[arms == 0].sum()); post_b = int(y[arms == 1].sum())
        assert r.diff_raw_milli == (post_b * 1000) // n_b - (post_a * 1000) // n_a
        if varx == 0.0:
            assert r.theta_micro is None and r.diff_cuped_milli is None
            continue
        theta = cov / varx
        assert r.theta_micro == math.floor(theta * 1_000_000)
        pre_a = int(x[arms == 0].sum()); pre_b = int(x[arms == 1].sum())
        diff = (post_b / n_b - post_a / n_a) - theta * (pre_b / n_b - pre_a / n_a)
        assert r.diff_cuped_milli == math.floor(diff * 1000)
        if vary != 0.0:
            assert r.rho2_ppm == math.floor(cov * cov / (varx * vary) * 1_000_000)


@settings(deadline=None, max_examples=10, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=2, max_size=10, unique=True),
    st.data(),
)
def test_platt_fit_matches_replica_on_random_lattices(spark, xs, data):
    """platt_from_deciles over arbitrary reliability lattices == the
    from-scratch Python replica of the quantized Berkson fit (ppm/micro
    tolerance 1 for the exp()/ln() ulp boundary) — the closed form is
    deterministic, so agreement holds on any frame, not just the shipped
    corpus' near-separated one."""
    from test_curation import _platt_numpy

    from maap_data_pipelines_spark.operators.curation import platt_from_deciles

    rows = []
    for x in sorted(xs):
        n = data.draw(st.integers(min_value=1, max_value=1000))
        k = data.draw(st.integers(min_value=0, max_value=n))
        rows.append((x, n, k))
    df = spark.createDataFrame(
        rows, "conf_decile bigint, n_docs bigint, n_label_keep bigint"
    )
    got = {
        r.conf_decile: (r.platt_ppm, r.slope_micro, r.intercept_micro)
        for r in platt_from_deciles(df).collect()
    }
    want = _platt_numpy(rows)
    assert set(got) == set(want)
    for x in want:
        for g, w in zip(got[x], want[x]):
            assert abs(g - w) <= 1, (x, got[x], want[x])


@settings(deadline=None, max_examples=10, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=1), min_size=8, max_size=200)
)
def test_ab_sequential_matches_numpy(spark, convs):
    """The mSPRT readout over arbitrary per-user conversion frames ==
    the straight numpy mixture-likelihood formulas at the documented
    quantizations (tolerance 1 milli/ppm for the ln/exp ulp boundary);
    the reject flag is an exact integer function of the quantized
    log-LR."""
    import hashlib
    import math

    from maap_data_pipelines_spark.plans.events import (
        AB_SEQ_LN20_MILLI,
        AB_SEQ_TAU2,
        ab_sequential_from_users,
    )

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(convs)], "user_id bigint, conv bigint"
    )
    r = ab_sequential_from_users(df).collect()[0]

    def arm(u: int) -> int:
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    n_a = sum(1 for i in range(len(convs)) if arm(i) == 0)
    n_b = len(convs) - n_a
    c_a = sum(c for i, c in enumerate(convs) if arm(i) == 0)
    c_b = sum(c for i, c in enumerate(convs) if arm(i) == 1)
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (n_a, n_b, c_a, c_b)
    if n_a == 0 or n_b == 0:
        return
    assert r.delta_micro == (c_b * 1_000_000) // n_b - (c_a * 1_000_000) // n_a
    pool = (c_a + c_b) / (n_a + n_b)
    v = pool * (1 - pool) * (1 / n_a + 1 / n_b)
    if v == 0.0:
        # ln(0) -> NULL log-LR; LEAST(1.0, NULL) -> 1.0 in BOTH engines,
        # which is the right semantics: no evidence, p = 1, never reject
        assert r.ln_lambda_milli is None
        assert r.always_valid_p_ppm == 1_000_000
        assert r.reject_at_5pct == 0
        return
    d = c_b / n_b - c_a / n_a
    lnl = 0.5 * math.log(v / (v + AB_SEQ_TAU2)) + d * d * AB_SEQ_TAU2 / (
        2 * v * (v + AB_SEQ_TAU2)
    )
    assert abs(r.ln_lambda_milli - math.floor(lnl * 1000)) <= 1
    p = min(1.0, math.exp(-lnl))
    assert abs(r.always_valid_p_ppm - math.floor(p * 1_000_000)) <= 1
    assert r.reject_at_5pct == int(r.ln_lambda_milli > AB_SEQ_LN20_MILLI)


def test_ab_sequential_behavior_null_vs_planted_effect(spark):
    """Statistical sanity: a balanced null frame must NOT reject (the
    always-valid p stays high), while a large planted effect must
    reject decisively — the always-valid guarantee is about never
    rejecting nulls at ANY look, not about losing all power."""
    from maap_data_pipelines_spark.plans.events import ab_sequential_from_users

    # null: conversion independent of the md5 arm (same rate both arms)
    null = spark.createDataFrame(
        [(i, i % 2) for i in range(2000)], "user_id bigint, conv bigint"
    )
    rn = ab_sequential_from_users(null).collect()[0]
    assert rn.reject_at_5pct == 0
    assert rn.always_valid_p_ppm > 50_000  # far from the 5% boundary
    # planted: arm b converts ~4x arm a
    import hashlib

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    rows = []
    for i in range(2000):
        a = arm(i)
        rows.append((i, 1 if (a == 1 and i % 5 != 0) or (a == 0 and i % 5 == 0) else 0))
    eff = spark.createDataFrame(rows, "user_id bigint, conv bigint")
    re_ = ab_sequential_from_users(eff).collect()[0]
    assert re_.reject_at_5pct == 1 and re_.always_valid_p_ppm < 1_000


def test_ab_sequential_degenerate_corpus_parity(spark, tmp_path):
    """ADVICE r9 (medium): with zero (or saturated) conversions the
    pooled variance V is 0 and the mixture log-LR's ln argument hits 0.
    Spark's ln(0) is NULL but DuckDB 1.x RAISES on ln(0), so the shared
    expression guards the argument with NULLIF(V, 0.0) — NULL in BOTH
    engines, p = 1, never reject. This pins the parity on a 10-user
    zero-purchase corpus: the oracle must RUN (no Out of Range error)
    and agree value-for-value with the Spark readout."""
    import duckdb
    import pandas as pd

    from maap_data_pipelines_spark.plans.events import (
        AB_SEQUENTIAL_SQL,
        events_ab_sequential,
    )

    rows = pd.DataFrame(
        {
            "event_id": range(10),
            "ts": pd.to_datetime([f"2024-01-0{1 + i % 9} 00:00:00" for i in range(10)]),
            "user_id": list(range(10)),
            "event_type": ["view"] * 10,  # zero purchases => conv == 0 everywhere
            "value": [0.0] * 10,
            "props": ["{}"] * 10,
        }
    )
    d = tmp_path / "degenerate"
    d.mkdir()
    rows.to_parquet(d / "events.parquet")

    got = events_ab_sequential(spark, str(d)).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = con.execute(AB_SEQUENTIAL_SQL).fetchone()  # must not raise
    assert (got.n_a, got.n_b, got.conv_a, got.conv_b) == tuple(want[:4])
    assert got.ln_lambda_milli is None and want[5] is None
    assert got.always_valid_p_ppm == want[6] == 1_000_000
    assert got.reject_at_5pct == want[7] == 0


@settings(deadline=None, max_examples=10, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5000),
            st.integers(min_value=0, max_value=5000),
        ),
        min_size=6,
        max_size=120,
    )
)
def test_diff_in_diff_matches_numpy(spark, prepost):
    """The DiD readout over arbitrary per-user (pre, post) frames == the
    straight numpy difference-in-differences formulas at the documented
    quantizations (tolerance 1 micro/milli at the sqrt ulp boundary);
    the point estimate is an exact integer function of the data."""
    import hashlib
    import math

    from maap_data_pipelines_spark.plans.events import did_readout

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(prepost)],
        "user_id bigint, pre_cents bigint, post_cents bigint",
    )
    r = did_readout(df).collect()[0]

    def arm(u: int) -> int:
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    g = {0: [], 1: []}
    for i, (a, b) in enumerate(prepost):
        g[arm(i)].append(b - a)
    n_a, n_b = len(g[0]), len(g[1])
    assert (r.n_a, r.n_b) == (n_a, n_b)
    if n_a == 0 or n_b == 0:
        return
    sd_a, sd_b = sum(g[0]), sum(g[1])

    def idiv(a: int, b: int) -> int:  # Spark div / DuckDB // truncate to 0
        return -((-a) // b) if (a < 0) != (b < 0) else a // b

    # the point estimate is EXACT: two int64 truncating divisions
    assert r.did_milli == idiv(sd_b * 1000, n_b) - idiv(sd_a * 1000, n_a)
    if n_a < 2 or n_b < 2:
        assert r.se_micro is None
        return
    sdd_a = sum(d * d for d in g[0])
    sdd_b = sum(d * d for d in g[1])
    var_a = (n_a * sdd_a - sd_a * sd_a) / (n_a * (n_a - 1))
    var_b = (n_b * sdd_b - sd_b * sd_b) / (n_b * (n_b - 1))
    se = math.sqrt(var_a / n_a + var_b / n_b)
    if se == 0.0:
        assert r.z_milli is None
        return
    assert abs(r.se_micro - math.floor(se * 1_000_000)) <= 1
    z = (sd_b / n_b - sd_a / n_a) / se
    assert abs(r.z_milli - math.floor(z * 1000)) <= 1


def test_diff_in_diff_null_vs_planted_effect(spark):
    """Statistical sanity: equal pre->post drift in both arms must read
    ~zero DiD; an uplift planted ONLY in arm b's post period must be
    detected with a decisive z."""
    import hashlib

    from maap_data_pipelines_spark.plans.events import did_readout

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2

    # null: both arms drift +100 cents, with INDEPENDENT pre/post noise
    null_rows = [(i, 1000 + i % 7, 1100 + (i * 13) % 23) for i in range(2000)]
    rn = did_readout(
        spark.createDataFrame(null_rows, "user_id bigint, pre_cents bigint, post_cents bigint")
    ).collect()[0]
    assert abs(rn.did_milli) < 10_000 and abs(rn.z_milli) < 1960
    # planted: arm b gains an extra +500 cents post
    eff_rows = [
        (i, 1000 + i % 7, 1100 + (i * 13) % 23 + (500 if arm(i) == 1 else 0))
        for i in range(2000)
    ]
    re_ = did_readout(
        spark.createDataFrame(eff_rows, "user_id bigint, pre_cents bigint, post_cents bigint")
    ).collect()[0]
    assert 490_000 <= re_.did_milli <= 510_000
    assert re_.z_milli > 10_000  # hugely significant


@settings(deadline=None, max_examples=8, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # price value (forces ties)
            st.booleans(),  # urgent flag
        ),
        min_size=6,
        max_size=150,
    )
)
def test_mann_whitney_kernel_matches_numpy(spark, rows):
    """The doubled-rank Mann-Whitney aggregation == the textbook
    average-rank computation (ranks, U, tie-corrected z) on arbitrary
    tied data — pinned via a single-segment frame through the same
    expression pipeline the registered query uses."""
    import math

    from pyspark.sql.window import Window

    from maap_data_pipelines_spark.plans import tpch2

    vals_rows = [("S", v, 1 if u else 0) for v, u in rows]
    df = spark.createDataFrame(vals_rows, "c_mktsegment string, cents bigint, urgent bigint")
    vals = df.groupBy("c_mktsegment", "cents").agg(
        F.count(F.lit(1)).alias("c"), F.sum("urgent").alias("u")
    )
    w_cum = (
        Window.partitionBy("c_mktsegment")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    contrib = vals.select(
        "c_mktsegment",
        "c",
        "u",
        (
            F.col("u")
            * (2 * F.coalesce(F.sum("c").over(w_cum), F.lit(0)) + F.col("c") + 1)
        ).alias("r1x2_g"),
        (F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("tie_g"),
    )
    s = contrib.groupBy("c_mktsegment").agg(
        F.sum("u").alias("n1"),
        F.sum(F.col("c") - F.col("u")).alias("n2"),
        F.sum("r1x2_g").alias("r1x2"),
        F.sum("tie_g").alias("tie_term"),
    ).collect()[0]

    # textbook replica: average ranks over the sorted sample
    xs = sorted(rows)
    n = len(xs)
    ranks = {}
    i = 0
    vs = sorted({v for v, _ in rows})
    seen = 0
    tie_term = 0
    for v in vs:
        c = sum(1 for x, _ in rows if x == v)
        ranks[v] = seen + (c + 1) / 2
        tie_term += c**3 - c
        seen += c
    n1 = sum(1 for _, u in rows if u)
    n2 = n - n1
    r1 = sum(ranks[v] for v, u in rows if u)
    assert (s.n1, s.n2) == (n1, n2)
    assert s.r1x2 == int(2 * r1)
    assert s.tie_term == tie_term
    u1 = r1 - n1 * (n1 + 1) / 2
    assert s.r1x2 - n1 * (n1 + 1) == int(2 * u1)
    if n1 == 0 or n2 == 0 or n < 2:
        return
    sigma2 = n1 * n2 / 12 * ((n + 1) - tie_term / (n * (n - 1)))
    if sigma2 <= 0:
        return
    z = (u1 - n1 * n2 / 2) / math.sqrt(sigma2)
    # re-evaluate the registered expression on the aggregated row
    got_z = (
        (s.r1x2 - n1 * (n1 + 1) - n1 * n2)
        / (2.0 * math.sqrt(n1 * n2 / 12.0 * ((n + 1.0) - s.tie_term / (n * (n - 1.0)))))
    )
    assert abs(got_z - z) < 1e-9


def test_documents_ks_drift_identity_and_disjoint(spark):
    """KS edges: a baseline whose length distribution EQUALS the rest's
    reads d_num = 0; disjoint supports read the maximum d_ppm = 1e6 (at
    the boundary value, smallest-first tie-break)."""
    from maap_data_pipelines_spark.operators.text import documents_ks_drift

    same = [(i, "t", "en", "src0" if i % 2 == 0 else "src9", 100 + (i % 5))
            for i in range(200)]
    # i%2 and i%5 are independent mod 10: both sources see each length equally
    r = documents_ks_drift(
        spark.createDataFrame(same, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    ).collect()[0]
    assert r.d_num == 0 and r.d_ppm == 0 and r.ks_lambda_milli == 0

    disj = [(i, "t", "en", "src0", 10 + i % 3) for i in range(60)] + [
        (1000 + i, "t", "en", "srcX", 500 + i % 4) for i in range(80)
    ]
    r2 = documents_ks_drift(
        spark.createDataFrame(disj, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    ).collect()[0]
    assert (r2.n_base, r2.n_rest) == (60, 80)
    assert r2.d_num == 60 * 80 and r2.d_ppm == 1_000_000  # exact branch
    assert r2.at_n_chars == 12  # the last baseline step, smallest argmax


def test_supplier_gini_matches_numpy(spark, sf_dir):
    """The per-nation Gini == the textbook sorted-rank formula computed
    directly from the parquet with numpy (exact integers, so equality is
    exact up to the documented denominator quantization)."""
    import duckdb

    from maap_data_pipelines_spark.plans.tpch2 import supplier_gini_by_nation

    got = {
        r.n_name: (r.n_suppliers, r.total_cents, r.gini_ppm)
        for r in supplier_gini_by_nation(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT n_name, l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev
        FROM read_parquet('{sf_dir}/lineitem.parquet') li
        JOIN read_parquet('{sf_dir}/supplier.parquet') s ON l_suppkey = s_suppkey
        JOIN read_parquet('{sf_dir}/nation.parquet') n ON s_nationkey = n_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    by_nation: dict = {}
    for n_name, suppkey, rev in rows:
        by_nation.setdefault(n_name, []).append((rev, suppkey))
    assert set(got) == set(by_nation)
    for n_name, cells in by_nation.items():
        xs = [rev for rev, _ in sorted(cells)]
        n, total = len(xs), sum(xs)
        num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * total
        want_gini = num // max((n * total) // 1_000_000, 1)
        assert got[n_name] == (n, total, want_gini), n_name
        assert 0 <= got[n_name][2] <= 1_000_000


def test_chi2_independence_product_table_and_dependence(spark):
    """Chi² edges: a contingency table that is EXACTLY a product
    distribution reads chi2_micro == 0 (O == E cell-for-cell, floor of
    exact zeros); a lang column perfectly determined by source reads the
    theoretical maximum n·(min(R,C)−1); dof arithmetic pinned."""
    from maap_data_pipelines_spark.operators.text import documents_chi2_independence

    # product table: source i (row total 40/60), lang j (col total 50/50)
    rows = []
    k = 0
    for src, nr in (("a", 40), ("b", 60)):
        for lang, frac in (("en", 0.5), ("fr", 0.5)):
            for _ in range(int(nr * frac)):
                rows.append((k, "t", lang, src, 10))
                k += 1
    r = documents_chi2_independence(
        spark.createDataFrame(rows, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    ).collect()[0]
    assert (r.n_cells, r.n_sources, r.n_langs, r.dof) == (4, 2, 2, 1)
    assert r.chi2_micro == 0

    dep = [(i, "t", "en" if i % 2 == 0 else "fr", "a" if i % 2 == 0 else "b", 10)
           for i in range(200)]
    r2 = documents_chi2_independence(
        spark.createDataFrame(dep, "doc_id bigint, text string, lang string, source string, n_chars bigint")
    ).collect()[0]
    assert r2.dof == 1
    # perfect association: chi2 == n exactly (phi = 1), i.e. 200e6 micro
    assert abs(r2.chi2_micro - 200_000_000) <= 4  # <=1 micro floor bias/cell


def test_vocab_entropy_edges_and_numpy(spark):
    """Entropy pins: an all-distinct vocabulary reads H = ln N
    (redundancy 0); a single repeated token reads H = 0 (redundancy
    1e6); a mixed corpus matches the direct numpy computation at the
    documented micro quantization."""
    import math

    from maap_data_pipelines_spark.operators.text import vocab_entropy

    def docs_of(texts):
        return spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        )

    uni = vocab_entropy(docs_of([f"w{i} w{i+100}" for i in range(0, 100, 2)])).collect()[0]
    assert uni.n_tokens == uni.n_terms == 100
    assert uni.s_clnc_micro == 0  # every c == 1 -> c ln c == 0
    assert uni.h_micro_nats == math.floor(math.log(100) * 1_000_000)
    assert uni.redundancy_ppm == 0

    const = vocab_entropy(docs_of(["x x x x" for _ in range(25)])).collect()[0]
    assert (const.n_tokens, const.n_terms) == (100, 1)
    assert const.h_micro_nats in (0, -1)  # floor at the 1e-6 ulp boundary
    # single-term vocabulary: ln(V) = 0, the normalized ratios are
    # undefined — NULL by the guard, not an error (the mSPRT lesson)
    assert const.h_norm_ppm is None and const.redundancy_ppm is None

    import collections
    import random

    rng = random.Random(7)
    words = [f"t{rng.randint(0, 30)}" for _ in range(500)]
    mixed = vocab_entropy(docs_of([" ".join(words[i : i + 10]) for i in range(0, 500, 10)])).collect()[0]
    c = collections.Counter(words)
    n = sum(c.values())
    s_micro = sum(math.floor(v * math.log(v) * 1_000_000) for v in c.values())
    assert (mixed.n_tokens, mixed.n_terms, mixed.s_clnc_micro) == (n, len(c), s_micro)
    h = math.log(n) - s_micro / 1_000_000 / n
    assert abs(mixed.h_micro_nats - math.floor(h * 1_000_000)) <= 1


@settings(deadline=None, max_examples=8, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # px values (forces ties)
            st.integers(min_value=-10, max_value=10),  # py values
        ),
        min_size=4,
        max_size=120,
    )
)
def test_spearman_kernel_matches_numpy(spark, rows):
    """The doubled-rank Spearman aggregation == the textbook
    average-rank Pearson on arbitrary tied data (rho to 1e-9, the
    registered ppm output exact vs the mirrored expression tree)."""
    import math

    from maap_data_pipelines_spark.plans.tpch2 import orders_spearman_corr  # noqa: F401
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [("S", x, y) for x, y in rows], "c_mktsegment string, px long, py long"
    )
    wx = Window.partitionBy("c_mktsegment").orderBy("px")
    wxr = wx.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    wy = Window.partitionBy("c_mktsegment").orderBy("py")
    wyr = wy.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = df.select(
        (F.rank().over(wx).cast("long") + F.count(F.lit(1)).over(wxr)).alias("rx2"),
        (F.rank().over(wy).cast("long") + F.count(F.lit(1)).over(wyr)).alias("ry2"),
    )
    s = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx2").alias("sx"),
        F.sum("ry2").alias("sy"),
        F.sum(F.expr("CAST(rx2 AS DECIMAL(19,0)) * rx2")).alias("sxx"),
        F.sum(F.expr("CAST(ry2 AS DECIMAL(19,0)) * ry2")).alias("syy"),
        F.sum(F.expr("CAST(rx2 AS DECIMAL(19,0)) * ry2")).alias("sxy"),
    ).collect()[0]

    # textbook average ranks
    def avg_ranks(vals):
        order = sorted(set(vals))
        seen, r = 0, {}
        for v in order:
            c = vals.count(v)
            r[v] = seen + (c + 1) / 2
            seen += c
        return [r[v] for v in vals]

    xs = [x for x, _ in rows]
    ys = [y for _, y in rows]
    rx = avg_ranks(xs)
    ry = avg_ranks(ys)
    n = len(rows)
    assert s.n == n
    assert int(s.sx) == int(sum(2 * r for r in rx)) == n * (n + 1)
    assert int(s.sxy) == int(sum(round(2 * a) * round(2 * b) for a, b in zip(rx, ry)))
    # doubled-rank Pearson == rank Pearson (shift/scale invariant)
    mean_rx = sum(rx) / n
    mean_ry = sum(ry) / n
    num = sum((a - mean_rx) * (b - mean_ry) for a, b in zip(rx, ry))
    den = math.sqrt(
        sum((a - mean_rx) ** 2 for a in rx) * sum((b - mean_ry) ** 2 for b in ry)
    )
    # the registered expression tree, mirrored exactly
    nf, sxf, syf = float(s.n), float(s.sx), float(s.sy)
    sxxf, syyf, sxyf = float(s.sxx), float(s.syy), float(s.sxy)
    denf = math.sqrt((nf * sxxf - sxf * sxf) * (nf * syyf - syf * syf))
    if den == 0.0:
        assert denf == 0.0
        return
    rho_tree = (nf * sxyf - sxf * syf) / denf
    assert abs(rho_tree - num / den) < 1e-9
    assert -1.0 - 1e-12 <= rho_tree <= 1.0 + 1e-12


def test_spearman_edges(spark, tmp_path):
    """Registered-query edges on a synthetic star: a perfectly monotone
    balance->price link reads rho_ppm = 1e6 with NULL t (1 - rho^2 = 0);
    a perfectly anti-monotone link reads -1e6; a constant price column
    reads NULL rho (zero variance)."""
    import pandas as pd

    from maap_data_pipelines_spark.plans.tpch2 import orders_spearman_corr

    def star(prices, bals):
        d = tmp_path / f"star{len(list(tmp_path.iterdir()))}"
        d.mkdir()
        pd.DataFrame(
            {
                "c_custkey": range(len(bals)),
                "c_mktsegment": ["SEG"] * len(bals),
                "c_acctbal": bals,
            }
        ).to_parquet(d / "customer.parquet")
        pd.DataFrame(
            {
                "o_orderkey": range(len(prices)),
                "o_custkey": range(len(prices)),
                "o_totalprice": prices,
            }
        ).to_parquet(d / "orders.parquet")
        return str(d)

    mono = orders_spearman_corr(
        spark, star([10.0 + i for i in range(20)], [5.0 + 2 * i for i in range(20)])
    ).collect()[0]
    assert mono.n_orders == 20 and mono.rho_ppm == 1_000_000
    assert mono.t_milli is None  # 1 - rho^2 == 0 -> NULLIF -> NULL

    anti = orders_spearman_corr(
        spark, star([10.0 + i for i in range(20)], [5.0 - 2 * i for i in range(20)])
    ).collect()[0]
    assert anti.rho_ppm == -1_000_000

    const = orders_spearman_corr(
        spark, star([7.0] * 15, [5.0 + i for i in range(15)])
    ).collect()[0]
    assert const.rho_ppm is None and const.t_milli is None


def test_supplier_theil_matches_numpy(spark, sf_dir):
    """The per-nation Theil decomposition == the direct numpy
    computation from the parquet (exact on the quantized integers — the
    mirrored expression tree is IEEE-deterministic), and the
    decomposition identity Sum_j (S_j/S) T_j + T_between ~= T_global
    holds to the quantization tolerance."""
    import duckdb
    import math

    from maap_data_pipelines_spark.plans.tpch2 import supplier_theil_decomposition

    got = {
        r.n_name: (r.n_suppliers, r.total_cents, r.theil_within_nano, r.between_nano)
        for r in supplier_theil_decomposition(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT n_name, l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev
        FROM read_parquet('{sf_dir}/lineitem.parquet') li
        JOIN read_parquet('{sf_dir}/supplier.parquet') s ON l_suppkey = s_suppkey
        JOIN read_parquet('{sf_dir}/nation.parquet') n ON s_nationkey = n_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    by_nation: dict = {}
    for n_name, _suppkey, rev in rows:
        by_nation.setdefault(n_name, []).append(rev)
    assert set(got) == set(by_nation)
    n_tot = sum(len(v) for v in by_nation.values())
    s_tot = sum(sum(v) for v in by_nation.values())
    for n_name, revs in by_nation.items():
        n_j, s_j = len(revs), sum(revs)
        within = sum(
            math.floor(float(r) / s_j * math.log(float(r) * n_j / s_j) * 1e9)
            for r in revs
        )
        between = math.floor(
            float(s_j) / s_tot * math.log(float(s_j) * n_tot / (float(s_tot) * n_j)) * 1e9
        )
        assert got[n_name] == (n_j, s_j, within, between), n_name
    # decomposition identity (quantization-tolerant)
    t_global = sum(
        float(r) / s_tot * math.log(float(r) * n_tot / s_tot)
        for revs in by_nation.values()
        for r in revs
    )
    t_recomposed = sum(
        (sum(revs) / s_tot) * (got[n][2] / 1e9) for n, revs in by_nation.items()
    ) + sum(got[n][3] / 1e9 for n in by_nation)
    assert abs(t_global - t_recomposed) < 1e-5


@settings(deadline=None, max_examples=8, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),  # n_chars value (forces ties)
            st.integers(min_value=0, max_value=3),  # source index
        ),
        min_size=5,
        max_size=120,
    )
)
def test_kruskal_matches_numpy(spark, rows):
    """doc_length_kruskal == the textbook tie-corrected Kruskal-Wallis H
    on arbitrary data (exact vs the mirrored floor-quantized tree;
    ~1e-3-tolerant vs the unfloored textbook statistic)."""
    import math

    from maap_data_pipelines_spark.operators.text import doc_length_kruskal

    df = spark.createDataFrame(
        [(i, "t", "en", f"src{s}", v) for i, (v, s) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = doc_length_kruskal(df).collect()[0]

    # textbook: average ranks over the pooled sample
    vals = [v for v, _ in rows]
    order = sorted(set(vals))
    seen, rank = 0, {}
    tie = 0
    for v in order:
        c = vals.count(v)
        rank[v] = seen + (c + 1) / 2
        tie += c**3 - c
        seen += c
    groups: dict = {}
    for v, s in rows:
        groups.setdefault(s, []).append(rank[v])
    n = len(rows)
    k = len(groups)
    assert (r.k, r.n, r.tie_term) == (k, n, tie)
    # mirrored engine tree (exact)
    q = sum(
        (sum(round(2 * x) for x in g) ** 2) // len(g) for g in groups.values()
    )
    h = 3.0 * float(q) / (float(n) * (n + 1.0)) - 3.0 * (n + 1.0)
    denom = (float(n) * n * n - n) - float(tie)
    if denom == 0.0:
        assert r.h_milli is None
        return
    hc = h * ((float(n) * n * n - n) / denom)
    assert r.h_milli == math.floor(hc * 1000)
    # textbook H (unfloored)
    h_text = (12.0 / (n * (n + 1))) * sum(
        sum(g) ** 2 / len(g) for g in groups.values()
    ) - 3 * (n + 1)
    c_corr = 1 - tie / (n**3 - n)
    assert abs(hc - h_text / c_corr) < 3 * k / (n * (n + 1)) / max(c_corr, 1e-9) + 1e-9


def test_kruskal_null_vs_planted_shift(spark):
    """Statistical sanity: identical length distributions across sources
    read H ~ 0; a planted +100-char shift in one source is decisively
    detected (H >> the chi2_{k-1} 5% critical value)."""
    from maap_data_pipelines_spark.operators.text import doc_length_kruskal

    null_rows = [
        (i, "t", "en", f"src{i % 3}", 100 + (i // 3) % 20) for i in range(600)
    ]
    rn = doc_length_kruskal(
        spark.createDataFrame(
            null_rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    ).collect()[0]
    assert (rn.k, rn.n) == (3, 600)
    assert rn.h_milli < 5_991  # chi2_2 5% critical value, in milli

    shift_rows = [
        (i, "t", "en", f"src{i % 3}", 100 + (i // 3) % 20 + (100 if i % 3 == 0 else 0))
        for i in range(600)
    ]
    rs = doc_length_kruskal(
        spark.createDataFrame(
            shift_rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    ).collect()[0]
    assert rs.h_milli > 100_000  # decisive
    assert rs.eps2_ppm > 100_000  # large effect size


def test_durbin_watson_matches_numpy(spark, sf_dir):
    """The DW readout == the textbook statistic computed directly from
    the parquet daily series (exact integers through the mirrored IEEE
    tree), and the fixture series is plausibly independent (1 < DW < 3)."""
    import duckdb
    import math

    from maap_data_pipelines_spark.plans.etl import orders_durbin_watson

    r = orders_durbin_watson(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    xs = [
        row[0]
        for row in con.execute(
            f"""
            SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{sf_dir}/orders.parquet')
            GROUP BY CAST(o_orderdate AS DATE) ORDER BY 1 ASC
            """
        ).fetchall()
    ]
    # order of GROUP BY rows doesn't matter for n/s1/s2; re-fetch ordered by day for d2
    xs = [
        row[1]
        for row in con.execute(
            f"""
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{sf_dir}/orders.parquet')
            GROUP BY 1 ORDER BY 1
            """
        ).fetchall()
    ]
    n, s1 = len(xs), sum(xs)
    s2 = sum(x * x for x in xs)
    d2 = sum((b - a) ** 2 for a, b in zip(xs, xs[1:]))
    assert (r.n_days, r.total_cents) == (n, s1)
    denom = (float(n) * float(s2) - float(s1) * float(s1)) / float(n)
    dw = float(d2) / denom
    assert r.dw_milli == math.floor(dw * 1000)
    assert r.rho1_ppm == math.floor((1.0 - dw / 2.0) * 1_000_000)
    assert 1000 < r.dw_milli < 3000  # fixture: no strong serial correlation


def test_durbin_watson_alternation_and_trend(spark, tmp_path):
    """Behavioral pins: a perfectly alternating daily series reads
    DW -> 4 (negative lag-1 correlation); a slow smooth trend reads
    DW -> 0 (positive). One order per day makes the daily series the
    order series itself."""
    import pandas as pd

    from maap_data_pipelines_spark.plans.etl import orders_durbin_watson

    def star(prices):
        d = tmp_path / f"dw{len(list(tmp_path.iterdir()))}"
        d.mkdir()
        pd.DataFrame(
            {
                "o_orderkey": range(len(prices)),
                "o_custkey": range(len(prices)),
                "o_totalprice": prices,
                "o_orderdate": [
                    str(d.date())
                    for d in pd.date_range("2020-01-01", periods=len(prices))
                ],
            }
        ).to_parquet(d / "orders.parquet")
        return str(d)

    alt = orders_durbin_watson(
        spark, star([100.0 if i % 2 == 0 else 200.0 for i in range(400)])
    ).collect()[0]
    assert alt.dw_milli > 3900 and alt.rho1_ppm < -940_000

    trend = orders_durbin_watson(
        spark, star([100.0 + i for i in range(400)])
    ).collect()[0]
    assert trend.dw_milli < 100 and trend.rho1_ppm > 950_000

    const = orders_durbin_watson(spark, star([100.0] * 50)).collect()[0]
    assert const.dw_milli is None and const.rho1_ppm is None  # zero variance


def test_clustering_coefficient_matches_python(spark, sf_dir):
    """The per-node clustering-coefficient histogram == a pure-Python
    triangle/degree count over the SAME candidate edge list (fetched via
    the oracle's MinHash SQL), and credits Sum_v t_v = 3*n_triangles
    against the dedup_triangles census."""
    import duckdb
    from collections import defaultdict

    from maap_data_pipelines_spark.operators.dedup import (
        DEDUP_MINHASH_SQL,
        dedup_clustering_coefficient,
        dedup_triangles,
    )
    from maap_data_pipelines_spark.sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    got = {
        r.bucket: (r.n_nodes, r.mean_coeff_ppm, r.mean_degree_milli)
        for r in dedup_clustering_coefficient(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    edges = con.execute(
        f"SELECT doc_a, doc_b FROM ({DEDUP_MINHASH_SQL})"
    ).fetchall()
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # per-node triangles: for each node, count neighbor pairs that are edges
    tri = defaultdict(int)
    eset = {(min(a, b), max(a, b)) for a, b in edges}
    for v, nbrs in adj.items():
        ns = sorted(nbrs)
        t = sum(
            1
            for i in range(len(ns))
            for j in range(i + 1, len(ns))
            if (ns[i], ns[j]) in eset
        )
        tri[v] = t
    n_tri = sum(tri.values()) // 3
    census = dedup_triangles(docs).collect()[0]
    assert census.n_triangles == n_tri
    hist = defaultdict(lambda: [0, 0, 0])  # n, sum_coeff, sum_deg
    for v, nbrs in adj.items():
        d = len(nbrs)
        if d >= 2:
            cp = (2 * tri[v] * 1_000_000) // (d * (d - 1))
            b = cp // 100_000
        else:
            cp, b = None, -1
        hist[b][0] += 1
        if cp is not None:
            hist[b][1] += cp
        hist[b][2] += d
    want = {
        b: (
            n,
            (sc // n if b != -1 else None),
            (sd * 1000) // n,
        )
        for b, (n, sc, sd) in hist.items()
    }
    assert got == want


def test_cohen_kappa_matches_python_and_degenerate(spark, sf_dir):
    """kappa == the exact chance-corrected formula over the classifier's
    own confusion counts; an all-identical corpus (pe = 1) reads NULL
    kappa, never an error."""
    from maap_data_pipelines_spark.operators.curation import (
        quality_cohen_kappa,
        quality_nb_classifier,
    )
    from maap_data_pipelines_spark.sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    rows = quality_nb_classifier(docs).collect()
    n11 = sum(1 for r in rows if r.label_keep and r.pred_keep)
    n10 = sum(1 for r in rows if r.label_keep and not r.pred_keep)
    n01 = sum(1 for r in rows if not r.label_keep and r.pred_keep)
    n00 = sum(1 for r in rows if not r.label_keep and not r.pred_keep)
    n = len(rows)
    got = quality_cohen_kappa(docs).collect()[0]
    assert (got.n_docs, got.n11, got.n10, got.n01, got.n00) == (
        n, n11, n10, n01, n00,
    )
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    num = n * (n11 + n00) - pe_num
    den = n * n - pe_num

    def idiv(a, b):  # Spark div / DuckDB // truncate toward zero
        return -((-a) // b) if (a < 0) != (b < 0) else a // b

    assert got.agree_ppm == ((n11 + n00) * 1_000_000) // n
    assert got.pe_ppm == idiv(pe_num * 1_000_000, n * n)
    assert got.kappa_ppm == (idiv(num * 1_000_000, den) if den else None)
    assert 0 < got.kappa_ppm <= 1_000_000  # fixture: strong real agreement

    same = spark.createDataFrame(
        [(i, "the same plain text here", "en", "s", 24) for i in range(40)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    deg = quality_cohen_kappa(same).collect()[0]
    assert deg.n_docs == 40 and deg.agree_ppm == 1_000_000
    assert deg.pe_ppm == 1_000_000 and deg.kappa_ppm is None


def test_burstiness_matches_python_and_behavior(spark):
    """doc_burstiness == the exact (N·S2 − T²)/(N·T) Fano factor from a
    Counter replica; a term clumped in one doc reads VMR ~ T while a
    term spread one-per-doc reads VMR < 1."""
    from collections import Counter

    from maap_data_pipelines_spark.operators.text import doc_burstiness

    # 30 docs: 'u' once in every doc (Poisson-flat), 'b' 30 times in doc 0
    # (maximally bursty), filler terms to pad the top-k
    texts = []
    for i in range(30):
        t = ["u"]
        if i == 0:
            t += ["b"] * 30
        t += [f"w{i % 5}"] * 3
        texts.append(" ".join(t))
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r.term: r for r in doc_burstiness(df).collect()}
    n = 30
    per_doc = [Counter(t.split()) for t in texts]
    for term in got:
        cs = [c[term] for c in per_doc if term in c]
        t_tot, s2, dfreq = sum(cs), sum(c * c for c in cs), len(cs)
        r = got[term]
        assert (r.df, r.total_count) == (dfreq, t_tot), term
        assert r.mean_count_micro == (t_tot * 1_000_000) // n
        assert r.vmr_milli == ((n * s2 - t_tot * t_tot) * 1000) // (n * t_tot)
    assert got["u"].vmr_milli == 0  # exactly one per doc: zero variance
    assert got["b"].vmr_milli > 25_000  # ~T·(N−1)/N = 29 -> 29000 milli
    assert got["b"].vmr_milli == ((30 * 900 - 900) * 1000) // (30 * 30)


def test_rfm_transition_matches_python(spark, sf_dir):
    """The migration matrix == a pure-Python NTILE replica over the
    parquet (ANSI bucket sizing: ceil sizes to the first N%k buckets,
    deterministic (value, other, custkey) tie-break), with exact ppm
    row shares and the NONE churn/acquisition margins."""
    import duckdb
    from collections import Counter

    from maap_data_pipelines_spark.plans.etl import (
        RFM_TRANSITION_SPLIT,
        customer_rfm_transition,
    )

    got = {
        (r.seg_h1, r.seg_h2): (r.n_customers, r.row_share_ppm)
        for r in customer_rfm_transition(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT o_custkey,
               CASE WHEN CAST(o_orderdate AS DATE) <= DATE '{RFM_TRANSITION_SPLIT}'
                    THEN 1 ELSE 2 END AS half,
               CAST(COUNT(*) AS BIGINT) AS f,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m
        FROM read_parquet('{sf_dir}/orders.parquet') GROUP BY 1, 2
        """
    ).fetchall()

    def ntile(ordered_keys, k=3):
        n = len(ordered_keys)
        out, start = {}, 0
        for b in range(1, k + 1):
            size = n // k + (1 if b <= n % k else 0)
            for key in ordered_keys[start : start + size]:
                out[key] = b
            start += size
        return out

    seg = {1: {}, 2: {}}
    for half in (1, 2):
        hs = [(c, f, m) for c, h, f, m in rows if h == half]
        f_t = ntile([c for c, f, m in sorted(hs, key=lambda x: (x[1], x[2], x[0]))])
        m_t = ntile([c for c, f, m in sorted(hs, key=lambda x: (x[2], x[1], x[0]))])
        for c, f, m in hs:
            seg[half][c] = f"F{f_t[c]}M{m_t[c]}"
    matrix = Counter(
        (seg[1].get(c, "NONE"), seg[2].get(c, "NONE"))
        for c in set(seg[1]) | set(seg[2])
    )
    rowsum = Counter()
    for (s1, _s2), cnt in matrix.items():
        rowsum[s1] += cnt
    want = {
        k: (cnt, (cnt * 1_000_000) // rowsum[k[0]]) for k, cnt in matrix.items()
    }
    assert got == want


def test_rfm_transition_none_margins(spark, tmp_path):
    """Customers active in only one half land in the NONE churn /
    acquisition margins with exact row shares (synthetic star: 3
    customers only-H1, 3 only-H2, 3 in both)."""
    import pandas as pd

    from maap_data_pipelines_spark.plans.etl import customer_rfm_transition

    rows = []
    k = 0
    for c in range(3):  # only H1
        rows.append((k, 100 + c, 10.0 + c, "1994-01-01")); k += 1
    for c in range(3):  # only H2
        rows.append((k, 200 + c, 10.0 + c, "1997-01-01")); k += 1
    for c in range(3):  # both halves
        rows.append((k, 300 + c, 10.0 + c, "1994-06-01")); k += 1
        rows.append((k, 300 + c, 20.0 + c, "1996-06-01")); k += 1
    d = tmp_path / "rfmt"
    d.mkdir()
    pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    ).to_parquet(d / "orders.parquet")
    got = customer_rfm_transition(spark, str(d)).collect()
    churn = sum(r.n_customers for r in got if r.seg_h2 == "NONE")
    acq = sum(r.n_customers for r in got if r.seg_h1 == "NONE")
    assert churn == 3 and acq == 3
    # per-origin shares sum to ~1e6 (floor residue < rows per origin)
    from collections import Counter

    share = Counter()
    for r in got:
        share[r.seg_h1] += r.row_share_ppm
    for s1, tot in share.items():
        assert 1_000_000 - 16 <= tot <= 1_000_000, s1


def test_hill_tail_index_matches_python(spark, sf_dir, tmp_path):
    """Hill alpha == the mirrored floor-quantized replica over the true
    top-(k+1) order statistics; a constant tail reads NULL; a planted
    Pareto(alpha=2) sample recovers alpha ~ 2."""
    import duckdb
    import math

    import pandas as pd

    from maap_data_pipelines_spark.plans.etl import (
        HILL_TOPK,
        orders_hill_tail_index,
    )

    r = orders_hill_tail_index(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    cents = [
        c
        for (c,) in con.execute(
            f"""
            SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
            FROM read_parquet('{sf_dir}/orders.parquet')
            ORDER BY cents DESC LIMIT {HILL_TOPK + 1}
            """
        ).fetchall()
    ]
    lnc = [math.floor(math.log(float(c)) * 1_000_000) for c in cents]
    s_micro = sum(lnc[:HILL_TOPK])
    ref = lnc[HILL_TOPK]
    assert (r.n_top, r.s_micro, r.ref_micro) == (HILL_TOPK + 1, s_micro, ref)
    alpha = HILL_TOPK * 1_000_000.0 / float(s_micro - HILL_TOPK * ref)
    assert r.alpha_milli == math.floor(alpha * 1000)

    def star(prices):
        d = tmp_path / f"hill{len(list(tmp_path.iterdir()))}"
        d.mkdir()
        pd.DataFrame(
            {
                "o_orderkey": range(len(prices)),
                "o_custkey": range(len(prices)),
                "o_totalprice": prices,
            }
        ).to_parquet(d / "orders.parquet")
        return str(d)

    const = orders_hill_tail_index(spark, star([55.0] * 300)).collect()[0]
    assert const.alpha_milli is None  # zero log spread -> NULLIF -> NULL

    # planted Pareto(alpha=2): x = 100 / sqrt(u), deterministic grid u
    pareto = [100.0 / math.sqrt((i + 0.5) / 4000.0) for i in range(4000)]
    rp = orders_hill_tail_index(spark, star(pareto)).collect()[0]
    assert 1600 <= rp.alpha_milli <= 2400  # ~2.0 within estimator noise


def test_source_js_matrix_edges_and_python(spark, sf_dir):
    """JS-matrix edges: two sources with the IDENTICAL term distribution
    read ~0; disjoint vocabularies read exactly ln2 = 693 milli; the
    parquet matrix matches a pure-Python replica of the shared+exclusive
    identity pair-for-pair."""
    import duckdb
    import math
    from collections import Counter

    from maap_data_pipelines_spark.operators.text import source_js_matrix

    def docs_of(rows):
        return spark.createDataFrame(
            [(i, t, "en", s, len(t)) for i, (s, t) in enumerate(rows)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    same = docs_of([("a", "x y z x"), ("b", "x y z x")] * 10)
    r = source_js_matrix(same).collect()
    assert len(r) == 1 and abs(r[0].js_milli) <= 2

    disj = docs_of([("a", "p q r"), ("b", "u v w")] * 5)
    r2 = source_js_matrix(disj).collect()[0]
    # disjoint vocabularies: the pair spine still emits the row, with
    # zero shared terms and EXACTLY ln2 = 693 milli
    assert (r2.n_shared_terms, r2.js_milli) == (0, 693)
    mixed = docs_of(
        [("a", "common p p p"), ("b", "common u u u"), ("c", "common p u")] * 4
    )
    got = {
        (r.src_a, r.src_b): r for r in source_js_matrix(mixed).collect()
    }

    def lnm(v):
        return math.floor(1000 * math.log(v))

    texts = {
        "a": "common p p p " * 4,
        "b": "common u u u " * 4,
        "c": "common p u " * 4,
    }
    cnt = {s: Counter(t.split()) for s, t in texts.items()}
    tot = {s: sum(c.values()) for s, c in cnt.items()}
    for sa, sb in (("a", "b"), ("a", "c"), ("b", "c")):
        ca, cb, ta, tb = cnt[sa], cnt[sb], tot[sa], tot[sb]
        shared = set(ca) & set(cb)
        skp = sum(
            ca[t] * (lnm(2 * ca[t] * tb) - lnm(ca[t] * tb + cb[t] * ta))
            for t in shared
        )
        skq = sum(
            cb[t] * (lnm(2 * cb[t] * ta) - lnm(ca[t] * tb + cb[t] * ta))
            for t in shared
        )
        sa_, sb_ = sum(ca[t] for t in shared), sum(cb[t] for t in shared)

        def idiv(x, y):
            return -((-x) // y) if (x < 0) != (y < 0) else x // y

        want = idiv(
            idiv(skp + (ta - sa_) * 693, ta) + idiv(skq + (tb - sb_) * 693, tb),
            2,
        )
        r = got[(sa, sb)]
        assert (r.n_shared_terms, r.tokens_a, r.tokens_b) == (
            len(shared), ta, tb,
        )
        assert r.js_milli == want, (sa, sb)
    # a vs b share ONLY 'common': mostly-disjoint mass reads near ln2
    assert got[("a", "b")].js_milli > 500


def test_runs_test_matches_python_and_behavior(spark, sf_dir, tmp_path):
    """Runs test == the exact Wald-Wolfowitz replica over the parquet
    daily series; perfect alternation reads z >> 0, sticky halves read
    z << 0, a one-sided series reads NULL."""
    import duckdb
    import math

    import pandas as pd

    from maap_data_pipelines_spark.plans.etl import orders_runs_test

    r = orders_runs_test(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    days = con.execute(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM read_parquet('{sf_dir}/orders.parquet') GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    xs = [x for _, x in days]
    med = sorted(zip(xs, [d for d, _ in days]))[(len(xs) + 1) // 2 - 1][0]
    signs = [1 if x > med else 0 for x in xs if x != med]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    assert (r.n_above, r.n_below, r.r_runs) == (n1, n2, runs)
    n = n1 + n2
    mu = 2.0 * n1 * n2 / n + 1.0
    sig = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) / (float(n) * n * (n - 1.0)))
    assert r.z_milli == math.floor((runs - mu) / sig * 1000)

    def star(prices):
        d = tmp_path / f"rt{len(list(tmp_path.iterdir()))}"
        d.mkdir()
        pd.DataFrame(
            {
                "o_orderkey": range(len(prices)),
                "o_custkey": range(len(prices)),
                "o_totalprice": prices,
                "o_orderdate": [
                    str(dd.date())
                    for dd in pd.date_range("2020-01-01", periods=len(prices))
                ],
            }
        ).to_parquet(d / "orders.parquet")
        return str(d)

    alt = orders_runs_test(
        spark,
        star([
            (100.0 if i % 2 == 0 else 300.0) + i * 0.01 for i in range(200)
        ]),
    ).collect()[0]
    assert alt.z_milli > 9000  # maximal runs

    sticky = orders_runs_test(
        spark, star([100.0 + (i % 7) * 0.01 for i in range(100)]
                    + [300.0 + (i % 7) * 0.01 for i in range(100)])
    ).collect()[0]
    assert sticky.r_runs == 2 and sticky.z_milli < -9000

    oneside = orders_runs_test(
        spark, star([100.0, 100.0, 100.0, 200.0, 200.0])
    ).collect()[0]
    # median 100 -> equals dropped, only 'above' side remains
    assert oneside.n_below == 0 and oneside.z_milli is None


def test_interarrival_exponentiality_replica_and_planted(spark, sf_dir, tmp_path):
    """The KS-vs-exponential readout == a pure-Python replica over the
    same minute-bucketed per-user gaps; a planted CONSTANT-gap stream
    (deterministic scheduler, the bot signature) reads a near-maximal
    D; the fixture's organic stream reads a small D."""
    import duckdb
    import math

    import pandas as pd

    from maap_data_pipelines_spark.plans.events import (
        events_interarrival_exponentiality,
    )

    r = events_interarrival_exponentiality(spark, sf_dir).collect()[0]
    con = duckdb.connect()
    gaps = [
        g
        for (g,) in con.execute(
            f"""
            SELECT (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                      PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
                   // 60000000 AS g
            FROM read_parquet('{sf_dir}/events.parquet')
            """
        ).fetchall()
        if g is not None
    ]
    from collections import Counter

    c = Counter(gaps)
    n, sg = len(gaps), sum(gaps)
    best = None
    cum = 0
    for g in sorted(c):
        cum += c[g]
        fexp = math.floor((1.0 - math.exp(-(float(g) * n) / float(sg))) * 1_000_000)
        d = abs((cum * 1_000_000) // n - fexp)
        if best is None or d > best[0]:
            best = (d, g)
    assert (r.n_gaps, r.sum_gap_min) == (n, sg)
    assert (r.d_micro, r.at_gap_min) == best
    assert r.ks_lambda_milli == math.floor(best[0] / 1e6 * math.sqrt(n) * 1000)

    # planted deterministic scheduler: every gap exactly 10 minutes
    rows = []
    for u in range(5):
        for i in range(200):
            rows.append((u * 1000 + i, u, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=10 * i)))
    d = tmp_path / "expo"
    d.mkdir()
    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    pdf["event_type"] = "view"
    pdf["value"] = 0.0
    pdf["props"] = "{}"
    pdf.to_parquet(d / "events.parquet")
    rp = events_interarrival_exponentiality(spark, str(d)).collect()[0]
    # all mass at g=10, F_exp(10) = 1 - e^-1 ~ 0.632 -> D ~ 0.368
    assert rp.n_gaps == 5 * 199 and rp.at_gap_min == 10
    assert 360_000 <= rp.d_micro <= 375_000
    assert rp.ks_lambda_milli > 11_000  # decisive rejection
    assert r.d_micro < 50_000  # the organic fixture is near-Poisson


def test_retrieval_ndcg_replica_and_misordering(spark, sf_dir):
    """NDCG == a pure-Python replica of the quantized gain sums over the
    engine's own BM25 ranking; on the organic fixture BM25 orders
    perfectly (ndcg = 1e6 for every query); on a planted tf-spam corpus
    a rel-1 doc with massive term repetition outranks rel-2 docs and
    NDCG correctly drops below 1."""
    import math

    from maap_data_pipelines_spark.operators.text import (
        BM25_QUERIES,
        BM25_TOPK,
        bm25_topk,
        retrieval_ndcg,
    )
    from maap_data_pipelines_spark.sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    got = {r.query_id: r for r in retrieval_ndcg(docs).collect()}
    ranked = bm25_topk(docs).collect()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    terms = {qid: set(ts) for qid, ts in BM25_QUERIES}

    def rel(qid, did):
        words = set(texts[did].lower().split())
        return len(terms[qid] & words)

    def gain(r, rank):
        return math.floor((2.0 ** r - 1.0) * 1_000_000 / math.log2(rank + 1.0))

    for qid in terms:
        dcg = sum(gain(rel(qid, r.doc_id), r.rnk) for r in ranked if r.query_id == qid)
        rels = sorted(
            (
                (rel(qid, did), did)
                for did in texts
                if rel(qid, did) > 0
            ),
            key=lambda x: (-x[0], x[1]),
        )[:BM25_TOPK]
        idcg = sum(gain(r, i + 1) for i, (r, _) in enumerate(rels))
        assert (got[qid].dcg_micro, got[qid].idcg_micro) == (dcg, idcg), qid
        assert got[qid].ndcg_ppm == (dcg * 1_000_000) // idcg
        assert got[qid].ndcg_ppm == 1_000_000  # fixture: perfect ordering

    # planted misordering for query 0 ('hash','join'): the rel-2 doc is
    # LONG (length-normalization penalty) and 'join' is near-stopword
    # common (idf ~ floor), while a SHORT rel-1 doc carries saturated
    # 'hash' tf — BM25 ranks the rel-1 doc first, NDCG must notice
    long_tail = " ".join(f"pad{i}" for i in range(50))
    rows = [(0, "hash join " + long_tail, "en", "s", 400),
            (2, "hash hash hash hash", "en", "s", 19)]
    rows += [(10 + i, f"join w{i} w{i+1} w{i+2}", "en", "s", 20) for i in range(40)]
    spam = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    r0 = {r.query_id: r for r in retrieval_ndcg(spam).collect()}[0]
    top0 = [r.doc_id for r in bm25_topk(spam).collect() if r.query_id == 0]
    assert top0[0] == 2  # the spam doc really does win rank 1
    assert r0.ndcg_ppm < 1_000_000  # and NDCG flags the misordering


def test_retrieval_map_replica_and_buried_relevant(spark, sf_dir):
    """AP@10/MAP == a pure-Python replica of the quantized precision
    sums over the engine's own BM25 ranking (binary rel = doc carries
    >= 2 distinct query terms); a planted corpus where tf-spam buries
    the second relevant doc below rank 10 drops AP below 1e6."""
    from maap_data_pipelines_spark.operators.text import (
        BM25_QUERIES,
        BM25_TOPK,
        MAP_REL_MIN_TERMS,
        bm25_topk,
        retrieval_map,
    )
    from maap_data_pipelines_spark.sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    got = {r.query_id: r for r in retrieval_map(docs).collect()}
    ranked = bm25_topk(docs).collect()
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    terms = {qid: set(ts) for qid, ts in BM25_QUERIES}

    def is_rel(qid, did):
        return len(terms[qid] & set(texts[did].lower().split())) >= MAP_REL_MIN_TERMS

    aps = []
    for qid in sorted(terms):
        n_rel_total = sum(1 for did in texts if is_rel(qid, did))
        hits = 0
        sum_p = 0
        for r in sorted(
            (r for r in ranked if r.query_id == qid), key=lambda r: r.rnk
        ):
            if is_rel(qid, r.doc_id):
                hits += 1
                sum_p += (hits * 1_000_000) // r.rnk
        denom = min(n_rel_total, BM25_TOPK)
        ap = sum_p // denom if denom else None
        g = got[qid]
        assert (g.n_rel_total, g.n_rel_topk, g.sum_p_micro) == (
            n_rel_total, hits, sum_p,
        ), qid
        assert g.ap_micro == ap, qid
        aps.append(ap or 0)
    assert got[0].map_micro == sum(aps) // len(aps)

    # planted (the ndcg misordering corpus): the ONLY rel-2 doc for
    # query 0 is length-penalized below a saturated-tf rel-1 spam doc,
    # so its hit precision lands at rank >= 2 -> AP@10 < 1e6
    long_tail = " ".join(f"pad{i}" for i in range(50))
    rows = [(0, "hash join " + long_tail, "en", "s", 400),
            (2, "hash hash hash hash", "en", "s", 19)]
    rows += [(10 + i, f"join w{i} w{i+1} w{i+2}", "en", "s", 20) for i in range(40)]
    spam = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    r0 = {r.query_id: r for r in retrieval_map(spam).collect()}[0]
    assert r0.n_rel_total == 1 and r0.n_rel_topk == 1
    assert r0.ap_micro is not None and r0.ap_micro < 1_000_000


def test_kendall_tau_replica_and_planted_monotone(spark, sf_dir, tmp_path):
    """tau-b sufficient statistics == a pure-Python pair-count replica
    over the same (priority digit, price band) grid; a planted
    perfectly-monotone orders table reads tau_b_ppm ~ 1e6."""
    from maap_data_pipelines_spark.plans.tpch2 import (
        KENDALL_BAND_CAP,
        KENDALL_BAND_CENTS,
        orders_kendall_tau,
    )
    from maap_data_pipelines_spark.sources.catalog import read_table

    got = orders_kendall_tau(spark, sf_dir).collect()[0]
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    from collections import Counter

    cells = Counter()
    for r in orders:
        x = int(r.o_orderpriority[0])
        y = min(round(r.o_totalprice * 100) // KENDALL_BAND_CENTS, KENDALL_BAND_CAP)
        cells[(x, y)] += 1
    C = D = 0
    items = list(cells.items())
    for (xa, ya), ma in items:
        for (xb, yb), mb in items:
            if xb > xa and yb > ya:
                C += ma * mb
            elif xb > xa and yb < ya:
                D += ma * mb
    n = sum(cells.values())
    nx = Counter()
    ny = Counter()
    for (x, y), m in cells.items():
        nx[x] += m
        ny[y] += m
    tx2 = sum(v * (v - 1) for v in nx.values())
    ty2 = sum(v * (v - 1) for v in ny.values())
    assert (got.n_orders, got.concordant, got.discordant) == (n, C, D)
    assert (got.tie_x2, got.tie_y2) == (tx2, ty2)
    import math

    tau = 2.0 * (C - D) / math.sqrt(
        (n * (n - 1.0) - tx2) * (n * (n - 1.0) - ty2)
    )
    assert got.tau_b_ppm == math.floor(tau * 1_000_000)

    # planted monotone: priority digit and price rise together
    import pandas as pd

    d = tmp_path / "kt"
    d.mkdir()
    rows = []
    for i in range(200):
        p = i % 5 + 1
        rows.append(
            {"o_orderkey": i, "o_custkey": 1, "o_orderstatus": "F",
             "o_totalprice": float(p * 60_000), "o_orderdate": "1996-01-01",
             "o_orderpriority": f"{p}-X", "o_clerk": "c", "o_shippriority": 0,
             "o_comment": ""}
        )
    pd.DataFrame(rows).to_parquet(d / "orders.parquet")
    got2 = orders_kendall_tau(spark, str(d)).collect()[0]
    assert got2.discordant == 0 and got2.tau_b_ppm >= 999_000


def test_mad_outliers_replica(spark, sf_dir):
    """Per-group doubled median / doubled MAD / fence counts == a numpy
    replica over the same cents values."""
    import numpy as np

    from maap_data_pipelines_spark.plans.etl import lineitem_mad_outliers
    from maap_data_pipelines_spark.sources.catalog import read_table

    got = {r.returnflag: r for r in lineitem_mad_outliers(spark, sf_dir).collect()}
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    groups = {}
    for r in li:
        groups.setdefault(r.l_returnflag, []).append(
            int(round(r.l_extendedprice * 100))
        )
    for flag, vals in groups.items():
        v = np.sort(np.array(vals, dtype=np.int64))
        n = len(v)
        med2 = int(v[(n + 1) // 2 - 1]) + int(v[n // 2])
        d2 = np.sort(np.abs(2 * v - med2))
        mad4 = int(d2[(n + 1) // 2 - 1]) + int(d2[n // 2])
        n_out = int((2 * np.abs(2 * v - med2) > 3 * mad4).sum())
        g = got[flag]
        assert (g.n_rows, g.med2_cents, g.mad4_cents) == (n, med2, mad4), flag
        assert g.n_outliers == n_out and g.outlier_ppm == n_out * 1_000_000 // n


def test_bigram_entropy_replica_and_deterministic_chain(spark, sf_dir):
    """The three integer sufficient statistics == a pure-Python replica;
    a perfectly deterministic word chain reads H(W2|W1) = 0 and
    bigram perplexity exactly 1."""
    import math

    from maap_data_pipelines_spark.operators.text import corpus_bigram_entropy
    from maap_data_pipelines_spark.sources.catalog import read_table

    docs = read_table(spark, sf_dir, "documents")
    got = corpus_bigram_entropy(docs).collect()[0]
    from collections import Counter

    big = Counter()
    for r in docs.select("text").collect():
        ws = r.text.lower().split(" ")
        for w1, w2 in zip(ws, ws[1:]):
            big[(w1, w2)] += 1
    ctx = Counter()
    w2c = Counter()
    for (w1, w2), c in big.items():
        ctx[w1] += c
        w2c[w2] += c

    def s(counter):
        return sum(
            math.floor(c * math.log(c) * 1_000_000) for c in counter.values()
        )

    n = sum(big.values())
    assert (got.n_bigrams, got.n_distinct_bigrams, got.n_contexts) == (
        n, len(big), len(ctx),
    )
    assert (got.s_ctx_micro, got.s_big_micro, got.s_w2_micro) == (
        s(ctx), s(big), s(w2c),
    )
    assert got.h_cond_micro_nats == (s(ctx) - s(big)) // n

    chain = spark.createDataFrame(
        [(1, "a b c a b c a b c a b", "en", "s", 21),
         (2, "a b c a b c", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    g = corpus_bigram_entropy(chain).collect()[0]
    assert g.h_cond_micro_nats == 0 and g.ppl_bigram_milli == 1000
    assert g.mi_micro_nats == g.h_w2_micro_nats


def test_embedding_hubness_moments_and_invariants(spark, sf_dir):
    """Histogram mass equals the corpus size, total in-degree equals the
    emitted edge count (<= 10 per source), and the crossed scalars
    (mean/skew) are exactly the quantized moments of the histogram the
    operator itself emits."""
    import math

    from maap_data_pipelines_spark.operators.ann import embedding_hubness
    from maap_data_pipelines_spark.sources.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    rows = embedding_hubness(emb).collect()
    n_vecs = emb.count()
    hist = {r.k_occurrences: r.n_vecs for r in rows}
    assert sum(hist.values()) == n_vecs == rows[0].n_total
    edges = sum(k * c for k, c in hist.items())
    assert 0 < edges <= 10 * n_vecs
    s1 = sum(k * c for k, c in hist.items())
    s2 = sum(k * k * c for k, c in hist.items())
    s3 = sum(k * k * k * c for k, c in hist.items())
    m = s1 / n_vecs
    var = s2 / n_vecs - m * m
    skew = (s3 / n_vecs - 3.0 * m * s2 / n_vecs + 2.0 * m * m * m) / (
        math.sqrt(var) * var
    )
    for r in rows:
        assert r.mean_milli == math.floor(m * 1000)
        assert r.skew_milli == math.floor(skew * 1000)
