"""High-occ streak selection + query-frequency filter vs an independent
scalar oracle of the documented semantics (reference: rseed.c:8-48,156-180;
both are dormant in the reference driver — bypassed at rseed.c:127-132 and
uncalled at rmap.cpp:284 — and provided for capability parity)."""

import numpy as np

from rawhash_tpu.map.seedfilt import query_freq_filter, seed_select


def _seed_select_oracle(occ, q_pos, qlen, max_occ, max_max_occ, dist):
    """Scalar re-statement: walk streaks of occ>max_occ; keep the
    round(span/dist) lowest-occ hits per streak (strict-< heap eviction =>
    earliest index wins ties), cap 128; always drop occ>max_max_occ."""
    n = len(occ)
    flt = [False] * n
    if n <= 1 or not any(o > max_occ for o in occ):
        return np.array(flt)
    last0 = -1
    for i in range(n + 1):
        if i == n or occ[i] <= max_occ:
            if i - last0 > 1:
                ps = 0 if last0 < 0 else q_pos[last0]
                pe = qlen if i == n else q_pos[i]
                st, en = last0 + 1, i
                k = int((pe - ps) / dist + 0.499)
                kept = set()
                if k > 0:
                    k = min(k, 128)
                    # k smallest occ, earliest index on ties
                    ranked = sorted(range(st, en), key=lambda j: (occ[j], j))
                    kept = set(ranked[:k])
                for j in range(st, en):
                    flt[j] = j not in kept or occ[j] > max_max_occ
            last0 = i
    return np.array(flt)


def test_seed_select_matches_oracle_random():
    rng = np.random.default_rng(0)
    for trial in range(50):
        n = int(rng.integers(0, 60))
        occ = rng.integers(1, 40, size=n)
        q_pos = np.sort(rng.integers(0, 1000, size=n))
        qlen = 1000
        max_occ = int(rng.integers(2, 20))
        max_max_occ = int(rng.integers(max_occ, 50))
        dist = int(rng.choice([50, 100, 500]))
        got = seed_select(occ, q_pos, qlen, max_occ, max_max_occ, dist)
        want = _seed_select_oracle(
            occ.tolist(), q_pos.tolist(), qlen, max_occ, max_max_occ, dist
        )
        assert np.array_equal(got, want), (trial, occ, q_pos)


def test_seed_select_edges():
    # no high-occ hits: nothing filtered
    assert not seed_select([1, 2, 3], [10, 20, 30], 100, 5, 10, 50).any()
    # single element: untouched even if high-occ (reference early-outs n<=1)
    assert not seed_select([99], [10], 100, 5, 10, 50).any()
    # streak at both array ends, zero-budget streak fully dropped
    occ = np.array([50, 50, 1, 50])
    q_pos = np.array([0, 1, 2, 3])
    flt = seed_select(occ, q_pos, qlen=4, max_occ=5, max_max_occ=100, dist=1000)
    # spans are tiny -> k = round(span/1000) = 0 -> all high-occ dropped
    assert flt.tolist() == [True, True, False, True]
    # generous dist keeps the lowest-occ ones
    occ = np.array([10, 30, 20, 1])
    flt = seed_select(occ, [0, 100, 200, 300], qlen=400, max_occ=5,
                      max_max_occ=100, dist=150)  # k = round(300/150) = 2
    assert flt.tolist() == [False, True, False, False]
    # max_max_occ overrides selection
    flt = seed_select([10, 500], [0, 100], qlen=400, max_occ=5,
                      max_max_occ=100, dist=50)
    assert flt.tolist() == [False, True]


def test_seed_select_tie_break_earliest():
    # equal occ: the heap never evicts on ties -> earliest index kept
    occ = np.array([7, 7, 7, 7])
    flt = seed_select(occ, [0, 10, 20, 30], qlen=40, max_occ=5,
                      max_max_occ=100, dist=20)  # k = round(40/20) = 2
    assert flt.tolist() == [False, False, True, True]


def test_query_freq_filter():
    # below q_occ_max: untouched
    h = np.array([1, 1, 1, 2])
    assert query_freq_filter(h, q_occ_max=10, q_occ_frac=0.01).all()
    # dominant hash dropped, rare ones kept
    h = np.array([5] * 90 + list(range(100, 110)))
    keep = query_freq_filter(h, q_occ_max=50, q_occ_frac=0.5)
    assert not keep[:90].any() and keep[90:].all()
    # disabled by q_occ_frac <= 0 or q_occ_max <= 0
    assert query_freq_filter(h, 50, 0.0).all()
    assert query_freq_filter(h, 0, 0.5).all()
    # threshold is strict >: exactly n*frac occurrences survive
    h = np.array([1, 1, 2, 2])
    assert query_freq_filter(h, 2, 0.5).all()
