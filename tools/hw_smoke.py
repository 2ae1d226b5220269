"""Hardware smoke gate: every default Pallas route, compiled + oracle-checked.

Interpret-mode tests cannot see Mosaic target limits — round 3 shipped an
int16 Damerau kernel that passed every CPU test and crashed every real-TPU
scan ("Target does not support this comparison").  This gate compiles and
oracle-checks every kernel the scanner/fuzz layers can route to BY DEFAULT
on the real chip, and must pass before any end-of-round commit that touches
default routing.  The reference's contract is always-working any-input
dispatch (``levenshtein.rs:1104-1222``, ``damerau_levenshtein.rs:111-168``).

Each route drives the PUBLIC path (``CorpusScanner.distances`` /
``fuzz.partial_ratio_many`` / ``levenshtein.editops_many``) on a small
corpus, checks every result against the C oracle, and reports a coarse
rate.  One line per route; non-zero exit if any route fails.

Usage::

    python tools/hw_smoke.py                   # all routes
    python tools/hw_smoke.py --routes lev64,damerau_seq
    python tools/hw_smoke.py --out experiments/evidence/hw_smoke_r4.log
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np  # noqa: E402


def _corpus(rng, n, lo_len, hi_len, alpha=26):
    """n random lowercase strings with lengths in [lo_len, hi_len]."""
    out = []
    for _ in range(n):
        l = int(rng.integers(lo_len, hi_len + 1))
        out.append("".join(chr(97 + int(c))
                           for c in rng.integers(0, alpha, l)))
    return out


def _enc(s):
    return np.array([ord(c) for c in s], np.int64)


def _check_scan(metric, corpus, query, oracle_fn, *, score_cutoff=None,
                score_hint=None, weights=None, n_check=64):
    """Scan `query` against `corpus`; oracle-check a sample; return rate."""
    import jax
    from rapidfuzz_tpu.parallel.scan import CorpusScanner

    sc = CorpusScanner(corpus, metric=metric, weights=weights)
    kw = {}
    if score_cutoff is not None:
        kw["score_cutoff"] = score_cutoff
    if score_hint is not None:
        kw["score_hint"] = score_hint
    t0 = time.perf_counter()
    d = sc.distances(query, **kw)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = sc.distances(query, **kw)
    t_warm = time.perf_counter() - t0
    if score_cutoff is not None:
        values, valid = d.values, d.valid
    else:
        values, valid = d, None
    q = _enc(query)
    idx = np.linspace(0, len(corpus) - 1, min(n_check, len(corpus)),
                      dtype=int)
    for i in idx:
        # every oracle_fn returns DISTANCE-space values (matching
        # sc.distances); cutoffs here are distance cutoffs
        exp = oracle_fn(q, _enc(corpus[i]))
        if score_cutoff is not None:
            ok = exp <= score_cutoff
            assert bool(valid[i]) == bool(ok), \
                (metric, i, exp, score_cutoff, bool(valid[i]))
            if ok:
                _assert_score(metric, values[i], exp, i)
        else:
            _assert_score(metric, values[i], exp, i)
    return len(corpus) / t_warm, t_first


def _assert_score(metric, got, exp, i):
    if isinstance(exp, float):
        assert abs(float(got) - exp) < 1e-9, (metric, i, float(got), exp)
    else:
        assert int(got) == int(exp), (metric, i, int(got), int(exp))


def _route_lev64():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(1)
    corpus = _corpus(rng, 512, 48, 64)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 64))
    return _check_scan("levenshtein", corpus, q,
                       oracle.levenshtein_uniform)


def _route_lev_band():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(2)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 64))
    corpus = []
    for i in range(512):           # cluster near the query so some pass
        s = list(q)
        for _ in range(int(rng.integers(0, 24))):
            s[int(rng.integers(0, 64))] = chr(97 + int(rng.integers(0, 26)))
        corpus.append("".join(s))
    return _check_scan("levenshtein", corpus, q,
                       oracle.levenshtein_uniform, score_cutoff=15)


def _route_lev_hint():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(3)
    corpus = _corpus(rng, 512, 100, 128)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 128))
    return _check_scan("levenshtein", corpus, q,
                       oracle.levenshtein_uniform, score_hint=16)


def _route_lev_stream():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(4)
    corpus = _corpus(rng, 128, 1800, 2048)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 2000))
    return _check_scan("levenshtein", corpus, q,
                       oracle.levenshtein_uniform, n_check=16)


def _route_lev_stream_band():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(5)
    base = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 2048))
    corpus = []
    for i in range(128):
        s = list(base)
        for _ in range(int(rng.integers(0, 30))):
            s[int(rng.integers(0, 2048))] = chr(97 + int(rng.integers(0,
                                                                      26)))
        corpus.append("".join(s))
    return _check_scan("levenshtein", corpus, base,
                       oracle.levenshtein_uniform, score_cutoff=15,
                       n_check=16)


def _route_indel():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(6)
    corpus = _corpus(rng, 512, 48, 64)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 64))
    return _check_scan("indel", corpus, q, oracle.indel)


def _route_indel_band():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(7)
    base = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 512))
    corpus = []
    for i in range(256):
        s = list(base)
        for _ in range(int(rng.integers(0, 12))):
            s[int(rng.integers(0, 512))] = chr(97 + int(rng.integers(0,
                                                                     26)))
        corpus.append("".join(s))
    r = _check_scan("indel", corpus, base, oracle.indel,
                    score_cutoff=15, n_check=32)
    # cutoff 47 -> bw=3, admitted by default since the r4 retune
    # (evidence/lcs_band_speed_r4.log); keep the gate covering it
    r2 = _check_scan("indel", corpus, base, oracle.indel,
                     score_cutoff=47, n_check=32)
    return (min(r[0], r2[0]), r[1] + r2[1])


def _route_lcs():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(8)
    corpus = _corpus(rng, 512, 40, 64)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 60))
    return _check_scan("lcs_seq", corpus, q,
                       lambda a, b: max(a.size, b.size) - oracle.lcs_seq(
                           a, b))


def _route_osa():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(9)
    corpus = _corpus(rng, 512, 48, 64)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 64))
    return _check_scan("osa", corpus, q, oracle.osa)


def _route_jaro():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(10)
    corpus = _corpus(rng, 512, 4, 64)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 40))
    return _check_scan("jaro", corpus, q,
                       lambda a, b: 1.0 - oracle.jaro(a, b))


def _route_jaro_winkler():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(11)
    corpus = _corpus(rng, 512, 4, 64)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 40))
    return _check_scan("jaro_winkler", corpus, q,
                       lambda a, b: 1.0 - oracle.jaro_winkler(a, b))


def _route_wlev():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(12)
    corpus = _corpus(rng, 512, 32, 64)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 48))
    return _check_scan("levenshtein", corpus, q,
                       lambda a, b: oracle.levenshtein_weighted(
                           a, b, 1, 2, 3),
                       weights=(1, 2, 3))


def _route_damerau_seq():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(13)
    corpus = _corpus(rng, 4096, 32, 128)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 64))
    return _check_scan("damerau_levenshtein", corpus, q, oracle.damerau)


def _route_damerau_band():
    """Cutoff-banded sequential-pair Damerau (|i-j| <= k band)."""
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(18)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 64))
    corpus = []
    for i in range(2048):          # cluster near the query so some pass
        s = list(q)
        for _ in range(int(rng.integers(0, 20))):
            op = int(rng.integers(0, 3))
            p = int(rng.integers(0, max(1, len(s) - 1)))
            if op == 0:
                s[p] = chr(97 + int(rng.integers(0, 26)))
            elif op == 1 and p + 1 < len(s):
                s[p], s[p + 1] = s[p + 1], s[p]
            else:
                del s[p]
        corpus.append("".join(s))
    return _check_scan("damerau_levenshtein", corpus, q, oracle.damerau,
                       score_cutoff=7)


def _route_damerau_band_long():
    """Cutoff-banded long Damerau (streamed text chunks, O(k*M))."""
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(19)
    base = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 1400))
    corpus = []
    for i in range(96):
        s = list(base)
        for _ in range(int(rng.integers(0, 16))):
            op = int(rng.integers(0, 3))
            p = int(rng.integers(0, max(1, len(s) - 1)))
            if op == 0:
                s[p] = chr(97 + int(rng.integers(0, 26)))
            elif op == 1 and p + 1 < len(s):
                s[p], s[p + 1] = s[p + 1], s[p]
            else:
                del s[p]
        corpus.append("".join(s))
    return _check_scan("damerau_levenshtein", corpus, base,
                       oracle.damerau, score_cutoff=7, n_check=32)


def _route_damerau_long():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(14)
    corpus = _corpus(rng, 128, 400, 512)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 256))
    return _check_scan("damerau_levenshtein", corpus, q, oracle.damerau,
                       n_check=16)


def _route_damerau_long8k():
    """>4096-char bucket (nb up to 64 at sub <= 64): default-routable
    since MAX_TEXT_LONG rose to 8192."""
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(24)
    corpus = _corpus(rng, 16, 4097, 6000)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 128))
    return _check_scan("damerau_levenshtein", corpus, q, oracle.damerau,
                       n_check=8)


def _route_partial():
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(15)
    corpus = _corpus(rng, 512, 40, 64)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 24))
    return _check_scan("partial_ratio", corpus, q,
                       lambda a, b: 1.0 - oracle.partial_ratio(a, b),
                       n_check=32)


def _route_editops():
    """Recording kernels: editops_many round-trips on a small batch."""
    from rapidfuzz_tpu.distance import levenshtein
    from rapidfuzz_tpu import oracle
    rng = np.random.default_rng(16)
    choices = _corpus(rng, 64, 16, 64)
    q = "".join(chr(97 + int(c)) for c in rng.integers(0, 26, 48))
    t0 = time.perf_counter()
    many = levenshtein.editops_many(q, choices)
    t_first = time.perf_counter() - t0
    for s, ops in zip(choices, many):
        exp = oracle.levenshtein_uniform(_enc(q), _enc(s))
        assert len(ops) == exp, (s, len(ops), exp)
        # applying the ops must transform q into s
        out = list(q)
        for op in reversed(list(ops)):
            if op.tag == "replace":
                out[op.src_pos] = s[op.dest_pos]
            elif op.tag == "delete":
                del out[op.src_pos]
            else:
                out.insert(op.src_pos, s[op.dest_pos])
        assert "".join(out) == s, (q, s)
    return len(choices) / max(t_first, 1e-9), t_first


ROUTES = {
    "lev64": _route_lev64,
    "lev_band": _route_lev_band,
    "lev_hint": _route_lev_hint,
    "lev_stream": _route_lev_stream,
    "lev_stream_band": _route_lev_stream_band,
    "indel": _route_indel,
    "indel_band": _route_indel_band,
    "lcs": _route_lcs,
    "osa": _route_osa,
    "jaro": _route_jaro,
    "jaro_winkler": _route_jaro_winkler,
    "wlev": _route_wlev,
    "damerau_seq": _route_damerau_seq,
    "damerau_band": _route_damerau_band,
    "damerau_band_long": _route_damerau_band_long,
    "damerau_long": _route_damerau_long,
    "damerau_long8k": _route_damerau_long8k,
    "partial": _route_partial,
    "editops": _route_editops,
}


def _run_inline(names):
    """Run routes in THIS process; print one line each.  Child mode."""
    import jax
    dev = jax.devices()[0]
    print(f"# device {dev}", flush=True)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            rate, t_first = ROUTES[name]()
            print(f"OK   {name:<16} {rate/1e6:8.2f}M cands/s warm, "
                  f"first call {t_first:6.1f}s, total "
                  f"{time.time()-t0:6.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failed.append(name)
            tb = traceback.format_exc().splitlines()
            print(f"FAIL {name:<16} {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            for t in tb[-6:]:
                print("     " + t, flush=True)
    return failed


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--routes", default=None,
                    help="comma-separated subset of: " + ",".join(ROUTES))
    ap.add_argument("--out", default=None, help="also append to this file")
    ap.add_argument("--inline", action="store_true",
                    help="run routes in-process (child mode)")
    ap.add_argument("--timeout", type=float, default=600.0,
                    help="per-route subprocess timeout (parent mode)")
    args = ap.parse_args(argv)
    names = (args.routes.split(",") if args.routes else list(ROUTES))

    if args.inline:
        return 1 if _run_inline(names) else 0

    # Parent mode: one subprocess per route.  The axon tunnel's failure
    # mode is an in-process wedge that never recovers (a device op blocks
    # forever) — a single-process gate can hang on route 1 and validate
    # nothing.  Each route gets a fresh process, a timeout, and one
    # retry; the persistent compile cache keeps retries cheap.  Between
    # routes the parent pings the tunnel in a fresh process and waits out
    # down-windows instead of burning route timeouts on a dead tunnel.
    import subprocess

    def ping_ok():
        try:
            p = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp; "
                 "print(float(jax.jit(lambda a: a.sum())"
                 "(jnp.ones((8, 128)))))"],
                capture_output=True, text=True, timeout=75)
            return p.returncode == 0
        except subprocess.TimeoutExpired:
            return False

    def wait_alive(max_wait=1800.0):
        t0 = time.time()
        while time.time() - t0 < max_wait:
            if ping_ok():
                return True
            print("[hw_smoke] tunnel down; waiting 60s", flush=True)
            time.sleep(60.0)
        return False

    lines = [f"hw_smoke @ {time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime())}"]
    failed = []
    for name in names:
        if not wait_alive():
            lines.append(f"FAIL {name:<16} tunnel unreachable for 30min")
            failed.append(name)
            print(lines[-1], flush=True)
            continue
        status = None
        for attempt in range(2):
            t0 = time.time()
            try:
                p = subprocess.run(
                    [sys.executable, "-u", os.path.abspath(__file__),
                     "--inline", "--routes", name],
                    capture_output=True, text=True, timeout=args.timeout)
            except subprocess.TimeoutExpired:
                status = (f"FAIL {name:<16} timeout after "
                          f"{args.timeout:.0f}s (attempt {attempt})")
                continue
            body = [l for l in p.stdout.splitlines()
                    if l.startswith(("OK", "FAIL"))]
            if body and body[0].startswith("OK"):
                status = body[0]
                break
            status = (body[0] if body else
                      f"FAIL {name:<16} rc={p.returncode}: "
                      f"{(p.stdout + p.stderr)[-300:]}")
            if "timeout" not in status and attempt == 0 and not body:
                continue                     # crashed before reporting
            break
        if not status.startswith("OK"):
            failed.append(name)
        lines.append(status)
        print(status, flush=True)

    verdict = ("ALL ROUTES OK" if not failed
               else f"FAILED: {','.join(failed)}")
    lines.append(verdict)
    print(verdict)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "a") as f:
            f.write("\n".join(lines) + "\n")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
