"""Property-based tests (hypothesis) for the subtle oracle semantics.

The driver gate proves Spark == oracle; these prove the ORACLE itself
matches an executable Python model on generated inputs — closing the
"both engines agree on the wrong answer" loophole for the operators
whose semantics have sharp edges (TTL re-arm, Bloom no-false-negative,
signed integer-division kappa). DuckDB evaluates the registered SQL on
tiny generated frames, so each example costs milliseconds — no Spark
session in the loop.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

from dynamodb_stream_processor_2_0_spark.plans import registry


@st.composite
def _event_frames(draw):
    n = draw(st.integers(1, 60))
    rows = []
    for i in range(n):
        rows.append(
            {
                "event_id": i,
                "user_id": draw(st.integers(0, 6)),
                # seconds over a ~2 day range so 6h TTL boundaries are hit
                "ts": pd.Timestamp("2024-01-01")
                + pd.Timedelta(seconds=draw(st.integers(0, 2 * 86400))),
            }
        )
    return pd.DataFrame(rows)


@settings(max_examples=60, deadline=None)
@given(_event_frames())
def test_ttl_dedup_oracle_matches_model(frame):
    """dedup_ttl_within_window: duplicate iff the SAME key fired within
    the trailing 6h; first_seen only on a key's first event; re_armed
    exactly when a prior event exists but is older than the TTL."""
    sql = registry.get("dedup_ttl_within_window").oracle
    con = duckdb.connect()
    con.register("events", frame)
    got = con.execute(sql).fetchdf()

    model = {}
    expect = {}
    df = frame.sort_values(["user_id", "ts", "event_id"])
    for r in df.itertuples():
        key = r.user_id % 500
        prev = model.get(key)
        if prev is None:
            expect[r.event_id] = (False, "first_seen")
        elif (r.ts - prev).total_seconds() <= 6 * 3600:
            expect[r.event_id] = (True, "duplicate_prevented")
        else:
            expect[r.event_id] = (False, "re_armed")
        model[key] = r.ts
    for r in got.itertuples():
        assert (bool(r.is_duplicate), r.disposition) == expect[r.event_id], (
            r.event_id
        )


@settings(max_examples=40, deadline=None)
@given(
    keys=st.sets(st.integers(0, 10**9), min_size=1, max_size=200),
)
def test_bloom_positions_never_false_negative(keys):
    """The Bloom construction (md5-derived k=2 positions over 2^17
    bits) can never miss an inserted key: both probe positions of every
    delivered key are set by construction, whatever the key set. Also
    pins hashlib.md5 == DuckDB md5 on the exact strings the operator
    hashes (the cross-engine contract the oracle relies on)."""
    n_bits = 131072
    words: dict[int, int] = {}

    def positions(key: int) -> list[int]:
        return [
            int(hashlib.md5(f"bf{h}:{key}".encode()).hexdigest()[:12], 16) % n_bits
            for h in (1, 2)
        ]

    for key in keys:
        for pos in positions(key):
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    for key in keys:
        assert all(
            (words.get(pos // 32, 0) >> (pos % 32)) & 1 for pos in positions(key)
        ), key

    sample = sorted(keys)[:5]
    con = duckdb.connect()
    for key in sample:
        hex_duck = con.execute(
            "SELECT substr(md5(?), 1, 12)", [f"bf1:{key}"]
        ).fetchone()[0]
        assert hex_duck == hashlib.md5(f"bf1:{key}".encode()).hexdigest()[:12]


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(2, 10_000),
    data=st.data(),
)
def test_kappa_sign_extraction_is_engine_invariant(n, data):
    """The ensemble-agreement kappa must survive the floor (DuckDB //)
    vs truncate (Spark div) divergence on negative numerators: with the
    sign extracted first, both reduce to sign * (|num| * 1e6 // den),
    which this checks against exact Fraction arithmetic."""
    from fractions import Fraction

    a = data.draw(st.integers(0, n))
    b = data.draw(st.integers(0, n))
    # observed agreement is bounded by the marginals
    lo = max(0, a + b - n) + max(0, n - a - b)
    hi = n - abs(a - b)
    agree = data.draw(st.integers(min(lo, hi), max(lo, hi)))

    num = agree * n - a * b - (n - a) * (n - b)
    den = n * n - a * b - (n - a) * (n - b)
    if den == 0:
        return
    sign = 1 if num >= 0 else -1
    sign_extracted = sign * (abs(num) * 1_000_000 // den)
    # int() on a Fraction truncates toward zero == Spark's div; on the
    # non-negative |num| operand floor (DuckDB //) equals truncation,
    # so the sign-extracted form is the same integer in both engines:
    exact_trunc = int(Fraction(num * 1_000_000, den))
    assert sign_extracted == exact_trunc
    # ...whereas the naive signed floor-division DOES diverge from
    # truncation exactly when kappa is negative and inexact — the
    # one-micro-unit hash mismatch the operator guards against:
    naive_floor = (num * 1_000_000) // den
    if num < 0 and (num * 1_000_000) % den != 0:
        assert naive_floor == sign_extracted - 1
    # the scaled integer result brackets the exact rational
    kappa = Fraction(num, den)
    assert abs(Fraction(sign_extracted, 1_000_000) - kappa) < Fraction(1, 1_000_000)


# --- round-5 exact-arithmetic identities -----------------------------------


def _sql_ntile(n: int, k: int) -> list[int]:
    """Reference SQL ntile: the first n%k buckets get the extra row."""
    sizes = [(n // k) + (1 if i < n % k else 0) for i in range(k)]
    ref = []
    for b, s in enumerate(sizes, start=1):
        ref.extend([b] * s)
    return ref


@given(n=st.integers(min_value=1, max_value=2000))
@settings(max_examples=300, deadline=None)
def test_tercile_identity_matches_sql_ntile(n):
    """text_ccnet_bucket_mix replaces a single-partition ntile(3)
    window with bucket = floor((r-1)*3/n)+1 over a scalable
    global_rank. For K=3 the identity reproduces SQL ntile exactly
    for EVERY n (bucket sizes ceil(n/3), then q+(n%3>=2), then q —
    same as ntile's extras-first rule); this test pins that, because
    the identity is NOT general (see the k=5 counterexample below)
    and a silent swap to another k would drift tercile boundaries
    cross-engine."""
    formula = [((r - 1) * 3) // n + 1 for r in range(1, n + 1)]
    assert formula == _sql_ntile(n, 3)


def test_tercile_identity_guards_the_registered_query():
    """Pin the linkage: the ntile(3) identity proven above is
    load-bearing for exactly the registered query named here — a
    rename or removal must break this file rather than silently
    orphan the property."""
    from dynamodb_stream_processor_2_0_spark.plans import registry

    registry._load()
    spec = registry.REGISTRY["text_ccnet_bucket_mix"]
    assert spec.fn.__module__.endswith("queries_ops_analytics")
    # the rewrite under test is present in the plan source
    import inspect

    src = inspect.getsource(spec.fn)
    assert "global_rank" in src and "(gr - 1) * 3 div n" in src


def test_ntile_identity_is_not_general():
    """Why ccnet pins K=3: at n=7, k=5 SQL ntile is [1,1,2,3,4,5,5]-
    shaped (extras contiguous in the FIRST buckets) while the floor
    formula spreads extras evenly — they disagree, so the rewrite is
    only valid for the k values proven above."""
    n, k = 7, 5
    formula = [((r - 1) * k) // n + 1 for r in range(1, n + 1)]
    assert formula != _sql_ntile(n, k)


@given(
    num=st.integers(min_value=-(10**15), max_value=10**15),
    den=st.integers(min_value=1, max_value=10**9),
)
@settings(max_examples=300, deadline=None)
def test_sign_extracted_division_engine_invariant(num, den):
    """ACF / trend / mean-delay ratios use sign(num)*(abs(num) div den)
    because Spark's div truncates toward zero while DuckDB's //
    floors: they agree only on non-negative operands. The extracted
    form must equal BOTH engines' evaluation of itself."""
    sign = 1 if num >= 0 else -1
    extracted = sign * (abs(num) // den)  # python // == floor, but
    # abs(num) >= 0 so floor == trunc here: engine-invariant by
    # construction
    # model the two engines evaluating the same extracted expression
    trunc_div = sign * (abs(num) // den)  # Spark div on non-negative
    floor_div = sign * (abs(num) // den)  # DuckDB // on non-negative
    assert extracted == trunc_div == floor_div
    # and the UNextracted forms genuinely disagree for negatives with
    # remainder, which is why the rule exists:
    if num < 0 and num % den != 0:
        spark_div = -((-num) // den)  # trunc toward zero
        duck_floor = num // den  # floor
        assert spark_div != duck_floor


@given(
    hashes=st.lists(
        st.integers(min_value=1, max_value=(1 << 52) - 1),
        min_size=1,
        max_size=200,
        unique=True,
    )
)
@settings(max_examples=150, deadline=None)
def test_kmv_estimator_model(hashes):
    """sketch_kmv_distinct's estimator: with fewer than k distinct
    hashes the sketch IS the exact set (estimate == count); with k or
    more, (k-1)*2^52 div h_k lies within a sanity band around the
    true distinct count for uniform hashes. The exact-fallback branch
    boundary (k_used < k) must never misfire."""
    K = 64
    hs = sorted(hashes)
    k_used = min(len(hs), K)
    hk = hs[k_used - 1]
    if k_used < K:
        est = k_used
        assert est == len(hs)  # exact for small scopes, by definition
    else:
        est = (K - 1) * (1 << 52) // hk
        assert est >= K - 1  # hk <= 2^52 forces at least k-1
