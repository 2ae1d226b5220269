"""Headline benchmark: Levenshtein pair comparisons/s/chip (len-64 ASCII).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the BASELINE.json target of 1e9 pairs/s/chip
(the reference publishes no absolute numbers — SURVEY.md §6).

One-vs-many scan with the Pallas Myers/Hyyrö kernel: 64-char query against
a device-resident 1M-candidate corpus (the BatchComparator pattern,
``levenshtein.rs:1625-1657``, scaled to the chip).  Also reports the indel,
OSA and Jaro scan rates and corpus bytes/s as secondary fields.

Harness structure (why it looks like this): the axon TPU tunnel has two
failure modes — first compiles that take 30s–5min per kernel shape, and
intermittent wedges on device->host transfers that never recover in-process.
Defenses:
  * a persistent JAX compilation cache (``.jax_cache/``) shared by every
    child process, so a retried subprocess never recompiles;
  * each metric is measured in its OWN subprocess: the lev headline runs
    (and is retried) first, then the extras — a wedge in one extra can no
    longer zero the headline;
  * a global wall-clock budget (BENCH_BUDGET, default 900s) that skips
    remaining extras rather than overrunning the driver's patience.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
# partial runs LAST: its ~6.6k-op window body costs ~190s of remote
# Mosaic compile at EVERY first dispatch (the axon server recompiles
# per process; the local persistent cache only covers the XLA step —
# measured 189s first-call with a fully warm .jax_cache), plus tunnel
# variance.  Keeping it last means a slow partial can never starve the
# cheaper phases of budget.
EXTRAS = ("indel", "osa", "jaro", "banded", "indelband",
          "damerau", "damband", "wlev", "partial", "damlong")


def _child_env():
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", CACHE_DIR)
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    return env


def _run_phase(phase: str, timeout: float, extra_argv=()):
    """Run one measurement phase in a fresh subprocess; return its JSON."""
    p = subprocess.run(
        [sys.executable, "-u", __file__, "--phase", phase, *extra_argv],
        env=_child_env(), capture_output=True, text=True, timeout=timeout)
    for line in reversed(p.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"phase {phase}: no JSON (rc={p.returncode}): "
                       f"{(p.stdout + p.stderr)[-800:]}")


def main():
    os.makedirs(CACHE_DIR, exist_ok=True)
    budget = float(os.environ.get("BENCH_BUDGET", 900))
    deadline = time.time() + budget

    # pre-flight: the axon relay has been observed to go down for hours
    # (e.g. after a child was killed mid-remote-compile); a dead tunnel
    # makes every phase time out, so probe cheaply and wait for recovery
    # instead of burning the budget on doomed 4-minute attempts
    while True:
        try:
            _run_phase("ping", 45.0)
            break
        except (subprocess.TimeoutExpired, RuntimeError) as e:
            left = deadline - time.time()
            print(f"[bench] tunnel ping failed ({str(e)[:80]}); "
                  f"{left:.0f}s budget left", file=sys.stderr)
            if left < 400.0:
                raise SystemExit("bench failed: TPU tunnel unreachable "
                                 "(ping timed out until budget floor)")
            time.sleep(20.0)
    profile_argv = ()
    if "--profile" in sys.argv:
        profile_argv = ("--profile", sys.argv[sys.argv.index("--profile") + 1])

    cold = not os.listdir(CACHE_DIR)

    # Kernel-rate reference FIRST: the nq phase (16 queries per dispatch)
    # amortizes the tunnel's fixed per-dispatch cost away, so its rate is
    # the measured pure-kernel throughput.  The round-3 record (50.9M
    # headline, 0.05x, while nq in the SAME run measured 1.377e9) showed
    # the headline must defend itself against sustained tunnel
    # degradation: an attempt whose amortization vs this reference is
    # <0.5 is a stalled-tunnel artifact, not a kernel measurement, and is
    # retried rather than recorded (criterion-style repeatable-harness
    # discipline, rapidfuzz-benches/benches/bench_levenshtein.rs:27-63).
    nq_rate = None
    try:
        t0 = time.time()
        tmo = min(540.0 if cold else 240.0,
                  max(60.0, deadline - time.time() - 30.0))
        nq_rate = _run_phase("nq", tmo)["pairs_per_s"]
        print(f"[bench] nq ok in {time.time()-t0:.0f}s "
              f"({nq_rate/1e9:.3f}e9 pairs/s)", file=sys.stderr)
    except (subprocess.TimeoutExpired, RuntimeError) as e:
        print(f"[bench] nq reference failed: {str(e)[:200]}",
              file=sys.stderr)

    headline = None
    best = None          # best degraded attempt, recorded only as fallback
    last = ""
    for attempt, tmo in enumerate([540.0 if cold else 240.0, 240.0, 180.0,
                                   120.0, 120.0]):
        tmo = min(tmo, max(60.0, deadline - time.time() - 30.0))
        t0 = time.time()
        try:
            r = _run_phase("lev", tmo, profile_argv)
        except subprocess.TimeoutExpired:
            last = f"timeout after {tmo:.0f}s (attempt {attempt})"
            print(f"[bench] lev attempt {attempt} failed: {last[:200]}",
                  file=sys.stderr)
            continue
        except RuntimeError as e:
            last = str(e)[-800:]
            print(f"[bench] lev attempt {attempt} failed: {last[:200]}",
                  file=sys.stderr)
            continue
        rate = r["pairs_per_s"]
        if best is None or rate > best["pairs_per_s"]:
            best = r
        amort = rate / nq_rate if nq_rate else None
        if amort is not None and amort < 0.5:
            last = (f"attempt {attempt}: {rate/1e9:.3f}e9 is "
                    f"{amort:.2f}x the nq kernel rate — stalled tunnel, "
                    "retrying")
            print(f"[bench] {last}", file=sys.stderr)
            continue
        headline = r
        print(f"[bench] lev ok in {time.time()-t0:.0f}s "
              f"(attempt {attempt})", file=sys.stderr)
        break
    degraded = False
    if headline is None and best is not None:
        headline = best            # all attempts degraded: record honestly
        degraded = True
    if headline is None:
        raise SystemExit(f"bench failed after retries: {last}")

    extras = dict(headline.get("extra", {}))
    if nq_rate is not None:
        extras["nq_pairs_per_s"] = nq_rate
        extras["kernel_compute_pairs_per_s"] = nq_rate
        extras["dispatch_amortization"] = headline["pairs_per_s"] / nq_rate
        if headline["pairs_per_s"] < 0.9 * nq_rate:
            degraded = True
    if degraded:
        extras["degraded"] = True
    for phase in EXTRAS:
        remaining = deadline - time.time() - 10.0
        # damerau's cold compile runs ~5 min through the tunnel; killing
        # the child mid-compile leaves the remote compile server grinding
        # and wedges every later dispatch (observed: the NEXT bench run's
        # lev phases all timed out for 13 min) — so give it a window that
        # covers the compile or skip it outright
        # partial's window body (~6.6k ops) costs ~190s of remote Mosaic
        # compile at every first dispatch (measured with a warm local
        # cache; tunnel variance took one clean run to 302s) — give it a
        # window that covers compile + variance or skip it outright
        need = {"damerau": 420.0, "damband": 360.0, "wlev": 240.0,
                "damlong": 240.0, "partial": 420.0}.get(phase, 90.0)
        if remaining < need:
            extras[f"{phase}_skipped"] = "budget exhausted"
            continue
        t0 = time.time()
        # same record discipline the lev headline gets (round 3 proved
        # undefended phases eventually enshrine a bad number): phases
        # report their own in-run kernel-rate reference (quarter-batch
        # dispatch-floor split, _rate_with_ref); <0.5x amortization is a
        # stalled-tunnel artifact and is retried once, <0.9x is recorded
        # but marked degraded
        r = None
        for attempt in range(2):
            try:
                r = _run_phase(phase, min(max(240.0, need), remaining))
            except (subprocess.TimeoutExpired, RuntimeError) as e:
                r = None     # a stalled attempt-0 result must not
                             # outlive a failed retry (it was judged an
                             # artifact, not a measurement)
                extras[f"{phase}_error"] = str(e)[-200:]
                print(f"[bench] {phase} failed in {time.time()-t0:.0f}s",
                      file=sys.stderr)
                break
            am = r.get("dispatch_amortization")
            if am is not None and am < 0.5 and attempt == 0 \
                    and deadline - time.time() - 10.0 > need:
                print(f"[bench] {phase}: {am:.2f}x amortization — "
                      "stalled tunnel, retrying", file=sys.stderr)
                continue
            break
        if r is not None:
            extras[f"{phase}_pairs_per_s"] = r["pairs_per_s"]
            if "kernel_ref_pairs_per_s" in r:
                extras[f"{phase}_kernel_ref_pairs_per_s"] = \
                    r["kernel_ref_pairs_per_s"]
                extras[f"{phase}_dispatch_amortization"] = \
                    r["dispatch_amortization"]
                if r["dispatch_amortization"] < 0.9:
                    extras[f"{phase}_degraded"] = True
            print(f"[bench] {phase} ok in {time.time()-t0:.0f}s",
                  file=sys.stderr)

    target = 1e9
    value = headline["pairs_per_s"]
    print(json.dumps({
        "metric": "levenshtein_pairs_per_sec_per_chip_len64",
        "value": value,
        "unit": "pairs/s",
        "vs_baseline": value / target,
        "extra": extras,
    }))


# ---------------------------------------------------------------- children

def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return jax


def _corpus(lk, interpret, default_b=67108864):
    """Build the candidate corpus ON DEVICE (8M candidates by default).

    A host-generated corpus would mean a multi-GB host->device upload
    through the axon tunnel per phase — the single biggest wedge
    exposure.  jax.random generates it device-side in <=4M-row chunks
    (bounding peak HBM at ~1 GB during packing); only the handful of
    oracle-verified rows ever cross back to the host.

    Why 64M: the scan dispatch carries a fixed ~2.3 ms host-side cost
    through the axon tunnel that does NOT overlap device execution
    (measured: B=1M -> 3.16 ms, B=4M -> 5.43 ms, B=16M -> 16.7 ms; pure
    kernel compute is ~0.72-0.76 ms per 1M pairs).  The per-chip rate is
    therefore a function of how much work each dispatch carries; 64M
    amortizes the fixed cost to ~3% (measured 1.33e9 pairs/s, 97% of the
    pure-kernel rate) with a 4 GB packed corpus — comfortable in the
    v5e's 16 GB HBM, and a warm-cache phase still runs in ~13 s.
    """
    import numpy as np
    import jax
    import jax.numpy as jnp

    LEN = 64
    B = int(os.environ.get("BENCH_B", default_b if not interpret else 4096))
    query = np.random.default_rng(42).integers(97, 123, LEN, dtype=np.int32)
    step = min(B, 1 << 22)
    packed = []
    sampled = []          # (global row index, host row) for oracle checks
    want = {i: None for i in range(0, B, max(B // 5, 1))}
    for s in range(0, B, step):
        n = min(step, B - s)
        c = jax.jit(lambda k, n=n: jax.random.randint(
            k, (n, LEN), 97, 123, jnp.int32))(jax.random.PRNGKey(s + 42))
        c3, _ = lk.prepare_corpus(c, jnp.full((n,), LEN, jnp.int32),
                                  LB=LEN)
        packed.append(jax.block_until_ready(c3))
        for i in want:
            if s <= i < s + n:
                sampled.append((i, np.asarray(c[i - s])))
        del c
    cand3 = (packed[0] if len(packed) == 1
             else jnp.concatenate(packed, axis=1))
    lb2 = jnp.full((B // 128, 128), LEN, jnp.int32)
    jax.block_until_ready(cand3)
    mode = lk.pick_mode(query, 122)   # lowercase ASCII by construction
    return LEN, B, query, sampled, cand3, lb2, mode


def _rate(fn, B, interpret):
    """pairs/s, best of 3 10-iter timing windows.

    The axon tunnel intermittently injects multi-ms stalls into a window;
    the best window reflects true kernel throughput.
    """
    import jax
    import numpy as np
    iters = 10 if not interpret else 1
    windows = 3 if not interpret else 1

    def sync(out):
        # block_until_ready is NOT a reliable barrier through the axon
        # tunnel (yields impossible >1e10 pairs/s readings); a real
        # device->host transfer of one element is.
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf[:1, :1] if leaf.ndim >= 2 else leaf[:1])

    sync(fn())
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = fn()
        for _ in range(iters - 1):
            out = fn()
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return B / best, best


def _rate_with_ref(fn, fn_quarter, B, interpret):
    """(official pairs/s, kernel-rate reference, amortization).

    The axon tunnel's fixed per-dispatch host cost does not shrink with
    B; timing the same kernel at B and B/4 separates it:
    ``fixed = (4*t_q - t_full)/3`` and ``kernel_t = t_full - fixed``.
    The reference lets the parent mark records whose dispatch
    amortization has collapsed (<0.9x) as ``degraded`` instead of
    silently enshrining them — the same defense the lev headline gets
    from the nq phase (VERDICT r4 weak #1: the official indelband
    recorded 0.68x its own kernel rate with nothing noticing).
    """
    rate, t_full = _rate(fn, B, interpret)
    _, t_q = _rate(fn_quarter, max(B // 4, 1), interpret)
    if t_full > t_q * 1.05:
        # two-point fit t(B) = fixed + B*c over (B, B/4)
        kern_t = (t_full - t_q) * 4.0 / 3.0
        amort = min(kern_t / t_full, 1.0)
        return rate, B / kern_t, amort
    # quarter batch took as long as the full one: timing noise floor
    # (seen in CPU interpret runs) — no usable scaling signal
    return rate, rate, 1.0


def _emit_ref(rate, ref, amort, extra=None):
    out = {"pairs_per_s": rate, "kernel_ref_pairs_per_s": ref,
           "dispatch_amortization": amort}
    if extra:
        out["extra"] = extra
    print(json.dumps(out))


def _measure(phase: str):
    jax = _setup_jax()
    import numpy as np
    import jax.numpy as jnp

    if phase == "ping":
        x = jax.jit(lambda a: a.sum())(jnp.ones((8, 128)))
        print(json.dumps({"pairs_per_s": 0.0, "ping": float(x)}))
        return

    from rapidfuzz_tpu.ops.pallas import lev_kernel as lk
    from rapidfuzz_tpu.ops.pallas import tpu_backend

    interpret = not tpu_backend()
    LEN = 64
    if phase == "damerau":
        # O(N*M) kernel with its own (small) corpus layout — skip the
        # multi-GB shared-corpus build entirely.  The pair-per-lane tiles
        # are built ON DEVICE (the r3 phase uploaded a 64MB host corpus
        # through the tunnel — the single biggest wedge exposure).
        import numpy as np
        from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk
        query = np.random.default_rng(42).integers(97, 123, LEN,
                                                   dtype=np.int32)
        # B = 4M: at 2^18 the per-call host floor (query upload through
        # the tunnel) hid ~40% of the kernel (30M recorded for a ~63M
        # kernel; 50M at 2^20 — see r4 damerau B sweep); 2^22 puts the
        # fixed dispatch cost (and its ms-scale tunnel jitter, which
        # distorted the two-point fit at 2^21) under 10% of the ~63 ms
        # kernel
        sub = dk.SEQ_SUB
        # interpret floor: one full (sub, 128) block (nbk >= 1)
        Bd = 1 << 22 if not interpret else sub * 128
        lbmax = -(-max(LEN, 16) // 16) * 16
        nbk = Bd // (sub * 128)

        @jax.jit
        def build(key):
            c = jax.random.randint(key, (nbk, sub, 128, LEN), 97, 123,
                                   jnp.int32)
            b = jnp.full((nbk, sub, 128, lbmax), -2, jnp.int32)
            b = b.at[..., :LEN].set(c)
            b_cols = b.transpose(0, 3, 1, 2).reshape(nbk * lbmax, sub, 128)
            lb = jnp.full((nbk, sub, 128), LEN, jnp.int32)
            return b_cols, lb

        btd, ltd = build(jax.random.PRNGKey(7))
        btd = jax.block_until_ready(btd)
        # exactness spot-check: one tile row fetched back (small transfer)
        row0 = np.asarray(btd[:LEN, 0, 0])
        from rapidfuzz_tpu import oracle as _orc
        exp0 = _orc.damerau(query.astype(np.int64), row0.astype(np.int64))
        got = np.asarray(dk.damerau_seq_1v_many(
            query, btd, ltd, lbmax=lbmax, interpret=interpret))[0]
        assert int(got) == exp0, (int(got), exp0)
        stq = dk.stage_query_seq(query)    # BatchComparator pattern:
        # without staging, the two per-call query uploads cost ~2.7 ms
        # through the tunnel on top of the ~2.3 ms dispatch
        fn = lambda: dk.damerau_seq_1v_many(query, btd, ltd, lbmax=lbmax,
                                            interpret=interpret,
                                            staged=stq)
        nq4 = max(nbk // 4, 1)
        btq, ltq = btd[: nq4 * lbmax], ltd[:nq4]
        fnq = lambda: dk.damerau_seq_1v_many(query, btq, ltq, lbmax=lbmax,
                                             interpret=interpret,
                                             staged=stq)
        _emit_ref(*_rate_with_ref(fn, fnq, Bd, interpret))
        return
    if phase == "damband":
        # cutoff-banded sequential pairs (|i-j| <= 7 band, W=15 of 64
        # columns walked): the round-5 lever on the family's slowest
        # metric — dedup scans always carry a cutoff, and the reference
        # only uses it as a Delta-len guard
        # (damerau_levenshtein.rs:111-168)
        import numpy as np
        from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk
        query = np.random.default_rng(42).integers(97, 123, LEN,
                                                   dtype=np.int32)
        KB = 7
        # 16M candidates (4 GB tiles) so the ~2.3 ms fixed dispatch
        # cost and its tunnel jitter stay under 5% of the ~60 ms
        # kernel; built in 2M chunks into a donated buffer
        sub = dk.SEQ_SUB
        # interpret floor: one full (sub, 128) block (nbk >= 1)
        Bd = 1 << 24 if not interpret else sub * 128
        lbmax = -(-max(LEN, 16) // 16) * 16
        nbk = Bd // (sub * 128)
        nbc = min(nbk, (1 << 21) // (sub * 128))

        @jax.jit
        def build(key):
            # ~4 expected edits per candidate so a real fraction of the
            # corpus lands under the cutoff (the dedup workload shape)
            k1, k2 = jax.random.split(key)
            r = jax.random.randint(k1, (nbc, sub, 128, LEN), 97, 123,
                                   jnp.int32)
            m = jax.random.uniform(k2, (nbc, sub, 128, LEN)) \
                < (4.0 / LEN)
            c = jnp.where(m, r, jnp.asarray(query)[None, None, None, :])
            b = jnp.full((nbc, sub, 128, lbmax), -2, jnp.int32)
            b = b.at[..., :LEN].set(c)
            b_cols = b.transpose(0, 3, 1, 2).reshape(nbc * lbmax, sub,
                                                     128)
            lb = jnp.full((nbc, sub, 128), LEN, jnp.int32)
            return b_cols, lb

        if nbc == nbk:
            btd, ltd = build(jax.random.PRNGKey(17))
        else:
            place = jax.jit(
                lambda buf, part, i: jax.lax.dynamic_update_slice(
                    buf, part, (i * nbc * lbmax, 0, 0)),
                donate_argnums=0)
            btd = jnp.zeros((nbk * lbmax, sub, 128), jnp.int32)
            ltd = jnp.full((nbk, sub, 128), LEN, jnp.int32)
            for i in range(nbk // nbc):
                part, _ = build(jax.random.PRNGKey(17 + i))
                btd = place(btd, part, i)
                del part
        btd = jax.block_until_ready(btd)
        row0 = np.asarray(btd[:LEN, 0, 0])
        from rapidfuzz_tpu import oracle as _orc
        exp0 = _orc.damerau(query.astype(np.int64), row0.astype(np.int64))
        got = int(np.asarray(dk.damerau_seqband_1v_many(
            query, btd, ltd, lbmax=lbmax, kband=KB,
            interpret=interpret))[0])
        assert (got == exp0) if exp0 <= KB else (got > KB), (got, exp0)
        stq = dk.stage_query_seq(query)
        fn = lambda: dk.damerau_seqband_1v_many(
            query, btd, ltd, lbmax=lbmax, kband=KB, interpret=interpret,
            staged=stq)
        nq4 = max(nbk // 4, 1)
        btq, ltq = btd[: nq4 * lbmax], ltd[:nq4]
        fnq = lambda: dk.damerau_seqband_1v_many(
            query, btq, ltq, lbmax=lbmax, kband=KB, interpret=interpret,
            staged=stq)
        _emit_ref(*_rate_with_ref(fn, fnq, Bd, interpret))
        return
    if phase == "damlong":
        # 8192-char candidate bucket on the multi-block long kernel
        # (MAX_TEXT_LONG extension; hardware profile in
        # evidence/damerau_long_8k_r4.log: nb=64 at sub=32, 1.3x the
        # XLA scan).  Corpus built on device; tiny B — the metric is
        # per-pair cell throughput at O(N*M) = 4.2M cells/pair.
        import numpy as np
        from rapidfuzz_tpu.ops.pallas import damerau_kernel as dk
        rng = np.random.default_rng(42)
        qlen = 512 if not interpret else 24
        LB = dk.MAX_TEXT_LONG if not interpret else 256
        Bd = 128 if not interpret else 8
        query = rng.integers(97, 123, qlen, dtype=np.int32)
        nbk = -(-LB // 128)
        # same tile-height rule the library route uses (ADVICE r4: do
        # not duplicate the heuristic here)
        sub = dk.pick_sub_long(Bd, nbk)

        @jax.jit
        def build(key):
            b = jax.random.randint(key, (Bd, nbk * 128), 97, 123,
                                   jnp.int32)
            b = jnp.where(jnp.arange(nbk * 128) < LB, b, -2)
            lb = jnp.full((Bd, 128), LB, jnp.int32)
            return b, lb

        btd, ltd = build(jax.random.PRNGKey(7))
        btd = jax.block_until_ready(btd)
        row0 = np.asarray(btd[0, :LB])
        from rapidfuzz_tpu import oracle as _orc
        exp0 = _orc.damerau(query.astype(np.int64), row0.astype(np.int64))
        got = np.asarray(dk.damerau_long_1v_many(
            query, btd, ltd, nb=nbk, sub=sub, interpret=interpret))[0]
        assert int(got) == exp0, (int(got), exp0)
        fn = lambda: dk.damerau_long_1v_many(query, btd, ltd, nb=nbk,
                                             sub=sub, interpret=interpret)
        # half-batch reference (not quarter): at Bd/4 = 32 rows the
        # wrapper must drop to a smaller tile height, which breaks the
        # linear two-point fit — Bd/2 keeps the same kernel config
        nh = max(Bd // 2, sub)
        fnh = lambda: dk.damerau_long_1v_many(
            query, btd[:nh], ltd[:nh], nb=nbk, sub=sub,
            interpret=interpret)
        rate, t_full = _rate(fn, Bd, interpret)
        _, t_h = _rate(fnh, nh, interpret)
        if t_full > t_h * 1.02:
            kern_t = (t_full - t_h) * 2.0
            _emit_ref(rate, Bd / kern_t, min(kern_t / t_full, 1.0))
        else:
            _emit_ref(rate, rate, 1.0)
        return
    # the nq phase emits an [NQ, B/128, 128] i32 result — cap its corpus
    # so output + corpus stay well inside HBM at NQ=16; partial does
    # ~87 window-LCS evaluations per pair, so a smaller corpus already
    # amortizes its dispatch cost
    default_b = {"nq": 16777216, "partial": 16777216,
                 "wlev": 67108864}.get(phase, 67108864)
    LEN, B, query, sampled, cand3, lb2, mode = _corpus(lk, interpret,
                                                       default_b)
    staged = lk.stage_query(query, mode) if not interpret else None

    if phase == "lev":
        from rapidfuzz_tpu import oracle

        out = lk.lev_1v_many(query, cand3, lb2, mode=mode,
                             interpret=interpret)
        # verify sampled rows with BASIC indexing only: a fancy-indexed
        # gather on the device corpus took ~6 min to compile through the
        # axon tunnel (measured), wedging every attempt
        for i, row in sampled:
            got = int(out[i // 128, i % 128])
            exp = oracle.levenshtein_uniform(query.astype(np.int64),
                                             row.astype(np.int64))
            assert got == exp, (i, got, exp)

        profile_dir = None
        if "--profile" in sys.argv:
            profile_dir = sys.argv[sys.argv.index("--profile") + 1]
            jax.profiler.start_trace(profile_dir)
        pairs_per_s, dt = _rate(
            lambda: lk.lev_1v_many(query, cand3, lb2, mode=mode,
                                   staged=staged, interpret=interpret),
            B, interpret)
        extra = {
            "bytes_per_s_one_vs_many": pairs_per_s * LEN,
            "batch": B,
            "ms_per_scan": dt * 1e3,
            "device": str(jax.devices()[0]),
            # observability (SURVEY.md §5): the parent fills
            # kernel_compute_pairs_per_s / dispatch_amortization from the
            # nq phase's measured rate (the gap is the fixed per-dispatch
            # host cost of the axon tunnel)
        }
        if profile_dir is not None:
            jax.profiler.stop_trace()
            extra["profile_dir"] = profile_dir
        print(json.dumps({"pairs_per_s": pairs_per_s, "extra": extra}))
        return

    if phase == "nq":
        # sustained many-vs-many: 16 queries per dispatch share the corpus
        # tiles in one kernel (lev_kernel._run_nq) — the cdist/scan_many
        # serving rate, where the fixed dispatch cost amortizes away
        # (measured 1.376e9 pairs/s at NQ=16, == the pure-kernel rate)
        NQ = int(os.environ.get("BENCH_NQ", 16))
        qs = [np.random.default_rng(i).integers(97, 123, LEN, np.int32)
              for i in range(NQ)]
        st = lk.stage_queries(qs, mode) if not interpret else None
        fn = lambda: lk.lev_nq_many(qs, cand3, lb2, mode=mode, staged=st,
                                    interpret=interpret)
        pairs_per_s, _ = _rate(fn, B * NQ, interpret)
        print(json.dumps({"pairs_per_s": pairs_per_s}))
        return

    if phase == "banded":
        # score_cutoff <= 15 rides the pre-funneled-table band kernel
        from rapidfuzz_tpu.ops.pallas import band_kernel as bk
        stabs = jax.device_put(jnp.asarray(
            bk.build_shifted_tables(query, mode, LEN, bw=1)))
        probe = jnp.asarray(bk.probe_table(LEN, LEN, bw=1))
        scal = jnp.array([LEN, 15], jnp.int32)
        jax.block_until_ready(stabs)
        ntab = 2 if mode == "byte" else 1
        fn = lambda: bk._run_fast(scal, probe, stabs, cand3, lb2, LB=LEN,
                                  ntab=ntab, bw=1, interpret=interpret)
        pairs_per_s, _ = _rate(fn, B, interpret)
        print(json.dumps({"pairs_per_s": pairs_per_s}))
        return

    if phase == "indelband":
        # indel/fuzz.ratio score_cutoff as a banded-LCS scan: 512-char
        # corpus (the band pays above ~256 chars; see
        # evidence/lcs_band_speed_r3.log), cutoff 15, single-table path
        import numpy as np
        from rapidfuzz_tpu.ops.pallas import lcs_band_kernel as cbk
        LENB = 512
        # B = 16M: at 2^17 the ~6 ms fixed dispatch cost dominated the
        # ~0.9 ms kernel and recorded 28M for a 167M kernel
        # (evidence/lcs_band_ablate_r4.log); at 2^20 it still ate ~30%
        # (official r4: 113.9M — VERDICT weak #1), and the round-5
        # two-point fit put the true kernel at ~475M pairs/s, so even
        # 2^22 sat at 0.74 amortization.  2^24 (8 GB packed, the lev
        # phase's corpus scale) puts the ~3 ms fixed cost under 10% of
        # the ~34 ms kernel.  Built in 1M chunks written into a
        # preallocated buffer with donated dynamic_update_slice so peak
        # device memory stays at corpus size + one chunk.
        Bb = 1 << 24 if not interpret else 1 << 10
        # 256k-row chunks: the c/r/m build intermediates stay ~1.5 GB
        # next to the 8 GB packed buffer (1M chunks peaked ~14 GB and
        # OOM'd the 16 GB chip, evidence/bench_r5_indelband2.log)
        chunk = min(Bb, 1 << 18)
        rngb = np.random.default_rng(11)
        qb = rngb.integers(97, 123, LENB).astype(np.int32)

        @jax.jit
        def build_band(key):
            # ~4 expected edits per candidate, built ON DEVICE (a host
            # build would upload 2 GB through the tunnel)
            k1, k2 = jax.random.split(key)
            r = jax.random.randint(k1, (chunk, LENB), 97, 123, jnp.int32)
            m = jax.random.uniform(k2, (chunk, LENB)) < (4.0 / LENB)
            c = jnp.where(m, r, jnp.asarray(qb)[None, :])
            return lk.prepare_corpus(c, jnp.full((chunk,), LENB,
                                                 jnp.int32), LB=LENB)

        nchunks = Bb // chunk
        if nchunks == 1:
            cand3b, lb2b = build_band(jax.random.PRNGKey(13))
        else:
            place = jax.jit(
                lambda buf, part, i: jax.lax.dynamic_update_slice(
                    buf, part, (0, i * (chunk // 128), 0)),
                donate_argnums=0)
            cand3b = jnp.zeros((LENB // 4, Bb // 128, 128), jnp.uint32)
            for i in range(nchunks):
                part, _ = build_band(jax.random.PRNGKey(13 + i))
                cand3b = place(cand3b, part, i)
                del part
            lb2b = jnp.full((Bb // 128, 128), LENB, jnp.int32)
        cand3b = jax.block_until_ready(cand3b)
        # stage the per-step tables ONCE (the BatchComparator pattern,
        # exactly like the lev banded phase): without this the window
        # times host table construction + a 256KB tunnel upload per call,
        # not the kernel (r3 recorded 18.4M that way)
        stb = jax.block_until_ready(jnp.asarray(
            cbk.build_shifted_tables(qb, "local", LENB,
                                     cbk.band_words(15))))
        fn = lambda: cbk.lcs_banded_1v_many(qb, cand3b, lb2b, cutoff=15,
                                            mode="local", staged=stb,
                                            interpret=interpret)
        nq4 = max(lb2b.shape[0] // 4, 1)
        c3q, lbq = cand3b[:, :nq4], lb2b[:nq4]
        fnq = lambda: cbk.lcs_banded_1v_many(qb, c3q, lbq, cutoff=15,
                                             mode="local", staged=stb,
                                             interpret=interpret)
        _emit_ref(*_rate_with_ref(fn, fnq, Bb, interpret))
        return

    if phase == "partial":
        # fuzz.partial_ratio corpus scan: the windowed kernel sweeps all
        # n+m-1 clipped windows per candidate in one dispatch (24-char
        # query -> 87 window-LCS evaluations per pair)
        from rapidfuzz_tpu.ops.pallas import partial_kernel as pk
        qp = np.random.default_rng(9).integers(97, 123, 24, np.int32)
        stp = (jnp.array([24], jnp.int32),
               jnp.asarray(lk.build_pm_tables(qp, mode)))
        fn = lambda: pk.partial_ratio_1v_many(
            qp, cand3, lb2, mode=mode, staged=stp,
            interpret=interpret)[0]
        nq4 = max(lb2.shape[0] // 4, 1)
        c3q, lbq = cand3[:, :nq4], lb2[:nq4]
        fnq = lambda: pk.partial_ratio_1v_many(
            qp, c3q, lbq, mode=mode, staged=stp, interpret=interpret)[0]
        _emit_ref(*_rate_with_ref(fn, fnq, B, interpret))
        return

    if phase == "wlev":
        # weighted Levenshtein one-vs-many (weights 1,2,3) — the last
        # unmeasured kernel family in the official record; the reference
        # benches generic Levenshtein as a first-class curve
        # (rapidfuzz-benches/benches/bench_generic_levenshtein.rs:28-40)
        from rapidfuzz_tpu import oracle
        from rapidfuzz_tpu.ops.pallas import wlev_kernel as wk
        out = wk.wlev_1v_many(query, cand3, lb2, ins=1, dele=2,
                              sub_cost=3, mode=mode, interpret=interpret)
        for i, row in sampled:
            got = int(out[i // 128, i % 128])
            exp = oracle.levenshtein_weighted(query.astype(np.int64),
                                              row.astype(np.int64),
                                              1, 2, 3)
            assert got == exp, (i, got, exp)
        fn = lambda: wk.wlev_1v_many(query, cand3, lb2, ins=1, dele=2,
                                     sub_cost=3, mode=mode,
                                     interpret=interpret)
        nq4 = max(lb2.shape[0] // 4, 1)
        c3q, lbq = cand3[:, :nq4], lb2[:nq4]
        fnq = lambda: wk.wlev_1v_many(query, c3q, lbq, ins=1, dele=2,
                                      sub_cost=3, mode=mode,
                                      interpret=interpret)
        _emit_ref(*_rate_with_ref(fn, fnq, B, interpret))
        return

    if phase == "indel":
        from rapidfuzz_tpu.ops.pallas import lcs_kernel as ck
        fn = lambda: ck.lcs_1v_many(query, cand3, lb2, mode=mode,
                                    staged=staged, interpret=interpret)
    elif phase == "osa":
        from rapidfuzz_tpu.ops.pallas import osa_kernel as ok
        fn = lambda: ok.osa_1v_many(query, cand3, lb2, mode=mode,
                                    staged=staged, interpret=interpret)
    elif phase == "jaro":
        from rapidfuzz_tpu.ops.pallas import jaro_kernel as jk
        fn = lambda: jk.jaro_1v_many(query, cand3, lb2, mode=mode,
                                     staged=staged, interpret=interpret)[0]
    else:
        raise SystemExit(f"unknown phase {phase}")
    pairs_per_s, _ = _rate(fn, B, interpret)
    print(json.dumps({"pairs_per_s": pairs_per_s}))


if __name__ == "__main__":
    if "--phase" in sys.argv:
        _measure(sys.argv[sys.argv.index("--phase") + 1])
    else:
        main()
