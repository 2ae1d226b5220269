"""Sharded one-vs-many / many-vs-many corpus scans.

TPU-native equivalent of running a ``BatchComparator`` over a large corpus
(``/root/reference/src/distance/levenshtein.rs:1625-1657`` amortizes the
query PM table; here the corpus is sharded over the ``data`` mesh axis, the
query is replicated, and the compiled scan + optional top-k merge is reused
across calls).
"""

from __future__ import annotations

import functools
import hashlib
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import levenshtein as _lev_ops
from ..ops import lcs as _lcs_ops
from ..ops import osa as _osa_ops
from ..ops import damerau as _dam_ops
from ..ops import jaro as _jaro_ops
from ..ops import simple as _simple_ops
from ..utils import codec as _codec
from .topk import topk_merge

_KERNELS: dict[str, Callable] = {
    "levenshtein": _lev_ops.uniform_distance,
    "indel": None,   # derived from lcs below
    "lcs_seq": _lcs_ops.lcs_similarity,
    "osa": _osa_ops.osa_distance,
    "damerau_levenshtein": _dam_ops.damerau_distance,
}


def _distance_fn(metric: str):
    if metric == "indel":
        def f(a, la, b, lb):
            sim = _lcs_ops.lcs_similarity(a, la, b, lb)
            B = sim.shape[0]
            tot = (jnp.broadcast_to(la, (B,)) + jnp.broadcast_to(lb, (B,)))
            return tot.astype(jnp.int32) - 2 * sim
        return f
    if metric == "lcs_seq":
        def f(a, la, b, lb):
            sim = _lcs_ops.lcs_similarity(a, la, b, lb)
            B = sim.shape[0]
            mx = jnp.maximum(jnp.broadcast_to(la, (B,)),
                             jnp.broadcast_to(lb, (B,)))
            return mx.astype(jnp.int32) - sim
        return f
    if metric in ("prefix", "postfix"):
        sim_fn = (_simple_ops.prefix_similarity if metric == "prefix"
                  else _simple_ops.postfix_similarity)

        def f(a, la, b, lb):
            sim = sim_fn(a, la, b, lb)
            B = sim.shape[0]
            mx = jnp.maximum(jnp.broadcast_to(la, (B,)),
                             jnp.broadcast_to(lb, (B,)))
            return mx.astype(jnp.int32) - sim
        return f
    if metric == "hamming":
        return _simple_ops.hamming_distance   # padding semantics
    fn = _KERNELS[metric]
    if fn is None:
        raise ValueError(metric)
    return fn


def sharded_distances(metric: str, mesh: Mesh, query, corpus_chars,
                      corpus_lens):
    """Distances of one query against a sharded corpus -> global array."""
    fn = _distance_fn(metric)
    shard = NamedSharding(mesh, P("data", None))
    shard1 = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    c = jax.device_put(corpus_chars, shard)
    lc = jax.device_put(corpus_lens, shard1)
    q = jax.device_put(query[0], repl)
    lq = jax.device_put(query[1], repl)

    jfn = jax.jit(fn, out_shardings=shard1)
    return jfn(q, lq, c, lc)


_PALLAS_METRICS = ("levenshtein", "indel", "lcs_seq", "osa")
_F64_METRICS = ("jaro", "jaro_winkler")
_PARTIAL_METRICS = ("partial_ratio",)


def _lcs_run(scal, tabs, cand3, lb2, **statics):
    """Signature adapter: the LCS kernel takes no scalar operand."""
    from ..ops.pallas import lcs_kernel as _ck

    return _ck._run(tabs, cand3, lb2, **statics)


def _lcs_stream_run(scal, tabs, cand3, lb2, **statics):
    """Adapter for the streamed (long-bucket) LCS kernel."""
    from ..ops.pallas import stream_kernel as _sk

    return _sk._lcs_run(tabs, cand3, lb2, **statics)


class CorpusScanner:
    """Precompiled one-vs-many scan over a device-resident sharded corpus.

    The corpus is encoded once (packed + length-sorted on TPU), placed
    sharded over the mesh's ``data`` axis, and every query scan reuses the
    compiled program — the BatchComparator pattern scaled out.  On a TPU
    the scans run the Pallas kernels (Levenshtein incl. weighted/banded,
    indel, lcs_seq, OSA, Jaro family): byte corpora directly, wide
    alphabets through the per-query device remap, uniform-Levenshtein
    buckets > 1024 chars through the streaming chunk kernel, Damerau via
    the lane-column kernel.  Remaining cases (other metrics > 1024 chars,
    > 127-distinct-symbol queries) use the XLA kernels over the mesh.
    """

    def __init__(self, corpus, metric: str = "levenshtein",
                 mesh: Mesh | None = None, bucket: int | None = None,
                 prefix_weight: float = 0.1, weights=None):
        from ..ops.pallas import tpu_backend

        if mesh is None:
            devs = jax.devices()
            mesh = Mesh(devs, ("data",))
        self.mesh = mesh
        self.metric = metric
        self.prefix_weight = prefix_weight
        # weighted Levenshtein reduces algebraically where possible
        # (levenshtein.rs:1244-1279); only a general table needs the
        # Wagner-Fischer kernel
        self._wscale = 1
        self._weights = None
        self._zero = False
        if weights is not None and metric == "levenshtein":
            from ..distance.levenshtein import as_weight_table
            weights = as_weight_table(weights)
        if weights is not None and metric == "levenshtein" \
                and not weights.uniform:
            ins, dele, sub = (weights.insertion_cost, weights.deletion_cost,
                              weights.substitution_cost)
            if ins == dele == 0:
                self._zero = True
            elif ins == dele == sub:
                self._wscale = ins
            elif ins == dele and sub >= ins + dele:
                metric = self.metric = "indel"
                self._wscale = ins
            else:
                self._weights = (ins, dele, sub)
        # corpora whose elements exceed int32 are remapped through a dense
        # vocabulary; queries must then go through the *same* vocabulary
        # (pattern_match_vector.rs:104-154 overflow-hashmap equivalent).
        # A corpus containing int32.max itself also goes through the vocab:
        # the out-of-domain query sentinel (cmax+1 clipped to int32.max)
        # would otherwise collide with that real corpus char.
        self._vocab = None
        if corpus and all(type(s) is str for s in corpus):
            # vectorized ingestion: codepoints are always < 0x110000, so
            # neither the remap nor the int32.max-collision case can occur
            chars, lens = _codec.encode_batch(corpus, bucket)
        else:
            arrs = [_codec.encode_one(s) for s in corpus]
            if _codec._needs_remap(arrs) or any(
                    a.size and a.max() == np.iinfo(np.int32).max
                    for a in arrs):
                flat = (np.concatenate(arrs) if arrs
                        else np.empty(0, np.int64))
                self._vocab = np.unique(flat)
                arrs = [np.searchsorted(self._vocab, a).astype(np.int32)
                        for a in arrs]
            chars, lens = _codec.pad_batch(arrs, bucket)
        # corpus fingerprint: checkpoints must refuse to resume against a
        # different corpus of the same shape (silent result splicing).
        # chars+lens+vocab uniquely determine the original elements (the
        # vocab inverts the remap), so hashing the padded form is exact.
        h = hashlib.sha1()
        h.update(chars.tobytes())
        h.update(lens.tobytes())
        if self._vocab is not None:
            h.update(self._vocab.tobytes())
        self._fingerprint = h.hexdigest()
        n = len(lens)
        self.lengths = lens[:n].copy()     # host lengths, corpus order
        ndev = len(mesh.devices.flat)

        self._cmax = int(chars.max()) if chars.size else 0
        # LB cap: a candidate block is LB/4 * 32 * 128 u32 = LB KB; past
        # ~1024 the double-buffered blocks overflow VMEM -> XLA path.
        # RAPIDFUZZ_TPU_FORCE_PALLAS=interpret runs the Pallas path in
        # interpreter mode off-TPU (tests exercise the mesh composition)
        force = os.environ.get("RAPIDFUZZ_TPU_FORCE_PALLAS")
        self._interpret = force == "interpret"
        # gate on the MESH's devices, not the default backend: a CPU mesh
        # in a TPU-backed process (the driver's dryrun) must not route
        # into compiled Pallas
        mesh_tpu = tpu_backend() and all(
            getattr(d, "platform", "") not in ("cpu", "gpu", "rocm")
            for d in mesh.devices.flat)
        # levenshtein/indel/lcs/osa buckets beyond the VMEM cap stream the
        # text as a second Pallas grid dimension (stream_kernel; the
        # reference's long-text block kernels, levenshtein.rs:769-1019 /
        # osa.rs:156-227); jaro/jaro_winkler stream too, up to the
        # text-flag scratch budget
        self._stream = (metric in ("levenshtein", "indel", "lcs_seq",
                                   "osa")
                        and self._weights is None
                        and chars.shape[1] > 1024
                        and chars.shape[1] % 512 == 0)
        if metric in _F64_METRICS:
            from ..ops.pallas.stream_kernel import JARO_STREAM_MAX_LB
            self._stream = (1024 < chars.shape[1] <= JARO_STREAM_MAX_LB
                            and chars.shape[1] % 512 == 0)
        if metric == "levenshtein" and self._weights is not None:
            # weighted scans stream the DP row across text chunks
            # (wlev_stream; over-cap queries fall back to the XLA scan
            # on the unpacked device corpus at query time)
            self._stream = (chars.shape[1] > 1024
                            and chars.shape[1] % 512 == 0)
        self._pallas = ((mesh_tpu or bool(force))
                        and metric in (_PALLAS_METRICS + _F64_METRICS
                                       + _PARTIAL_METRICS)
                        and (chars.shape[1] <= 1024 or self._stream))
        self._stream = self._stream and self._pallas
        # wide alphabets (chars >= 256) ride the same kernels through a
        # per-query device-side remap to query-local ids (lev_kernel.
        # remap_corpus) instead of dropping to the ~100x-slower XLA path
        self._wide = self._pallas and self._cmax >= 256
        # the Damerau kernel keeps DP columns on the lane axis: any int32
        # alphabet, candidates <= 128 chars, 32 rows x (128/seg) segments
        # per tile; 128 < LB <= MAX_TEXT_LONG (8192) uses the multi-block
        # long form with reduction-free cross-block carry injection
        from ..ops.pallas import damerau_kernel as _dk_gate
        self._dam_pallas = ((mesh_tpu or bool(force))
                            and metric == "damerau_levenshtein"
                            and chars.shape[1] <= _dk_gate.MAX_TEXT_LONG)
        self._dam_long = self._dam_pallas and chars.shape[1] > 128
        # <= 128 chars rides the sequential-pair kernel (pairs in lanes,
        # zero lane scans — 35.5M len-64 pairs/s vs 8.4M lane-transposed)
        self._dam_seq = self._dam_pallas and not self._dam_long
        self._ndev = ndev
        self._smap_cache = {}
        if self._pallas:
            align = 4096 * ndev
        elif self._dam_pallas:
            from ..ops.pallas import damerau_kernel as _dkm
            if self._dam_long:
                align = 8 * ndev   # long tiles divide any multiple of 8
            elif self._dam_seq:
                align = _dkm.SEQ_SUB * 128 * ndev   # whole (sub,128) blocks
            else:
                align = 32 * (128 // _dkm.pick_seg(chars.shape[1])) * ndev
        else:
            align = ndev
        padded = -(-max(n, 1) // align) * align
        if padded != n:
            chars = np.concatenate(
                [chars, np.full((padded - n, chars.shape[1]), _codec.PAD,
                                np.int32)])
            # padded rows: length 0 — masked out of top-k by +inf distance
            lens = np.concatenate([lens, np.zeros(padded - n, np.int32)])
        self.n = n
        shard = NamedSharding(mesh, P("data", None))
        shard1 = NamedSharding(mesh, P("data"))
        self._order = None
        if self._pallas:
            from ..ops.pallas import lev_kernel as _lk
            # length-sort so each (32,128) kernel tile stops at its own
            # longest candidate (the kernels' dynamic trip count); padding
            # rows (length 0) sort to the front and are masked by _valid.
            # On a mesh, round-robin the sorted order across shards so
            # every shard carries a similar length distribution (the
            # longest shard is the scan's critical path).
            order = np.argsort(lens, kind="stable")
            if ndev > 1:
                order = np.concatenate([order[k::ndev] for k in range(ndev)])
            self._order = order
            self._valid = self._order < n
            chars = chars[self._order]
            lens = lens[self._order]
            self._LB = chars.shape[1]
            if self._wide:
                # keep the sorted corpus unpacked on device, PRE-TRANSPOSED
                # to the kernel layout (query-independent): each query
                # remaps it to query-local byte ids in a Pallas kernel
                # (remap_pack — the XLA searchsorted route's per-element
                # gathers scalarise at ~10 ns/char, 22.9 s for a 4M x 64
                # corpus); the > 127-distinct-symbol fallback rebuilds the
                # [B, LB] view on demand (_wide_chars_bl)
                cd = _lk.transpose_corpus(jnp.asarray(chars), LB=self._LB)
                lb2 = jnp.asarray(lens).reshape(-1, _lk.LANE)
                tshard = NamedSharding(mesh, P(None, "data", None))
                if ndev > 1:
                    cd = jax.device_put(cd, tshard)
                    lb2 = jax.device_put(
                        lb2, NamedSharding(mesh, P("data", None)))

                    def _remap_sharded(ct, vocab, _LB=self._LB):
                        local = functools.partial(
                            _lk.remap_pack, LB=_LB,
                            interpret=self._interpret)
                        return jax.jit(jax.shard_map(
                            local, mesh=mesh,
                            in_specs=(P(None, "data", None), P()),
                            out_specs=P(None, "data", None),
                            check_vma=False))(ct, vocab)
                    self._remap_fn = _remap_sharded
                else:
                    self._remap_fn = functools.partial(
                        _lk.remap_pack, LB=self._LB,
                        interpret=self._interpret)
                self._chars_dev = jax.block_until_ready(cd)
                self.cand3 = None
                self.lb2 = lb2
            else:
                cand3, lb2 = _lk.prepare_corpus(
                    jnp.asarray(chars), jnp.asarray(lens), LB=self._LB)
                if ndev > 1:
                    cand3 = jax.device_put(
                        cand3, NamedSharding(mesh, P(None, "data", None)))
                    lb2 = jax.device_put(
                        lb2, NamedSharding(mesh, P("data", None)))
                self.cand3 = jax.block_until_ready(cand3)
                self.lb2 = lb2
            self.lens = jax.device_put(lens, shard1)
            if metric in _F64_METRICS:
                self._lens_host = lens
                self._chars4 = chars[:, :4].copy()
            if metric in _PARTIAL_METRICS:
                # partial_ratio needs (a) host lengths to find candidates
                # shorter than the query (their window roles swap) and
                # (b) their chars for the host re-score; keep a compact
                # copy of the sorted corpus (ids are post-vocab-remap,
                # same domain the encoded query lives in)
                self._lens_host = lens
                self._pchars = self._compact_chars(chars)
        elif self._dam_pallas:
            from ..ops.pallas import damerau_kernel as _dk
            dam_shard = NamedSharding(mesh, P("data", None))
            if self._dam_long:
                bt, lt, self._dam_nb, self._dam_sub = \
                    _dk.prepare_corpus_long(chars, lens)
            elif self._dam_seq:
                bt, lt, self._dam_lbmax = _dk.prepare_corpus_seq(chars,
                                                                 lens)
                dam_shard = NamedSharding(mesh, P("data", None, None))
            else:
                bt, lt, self._dam_seg = _dk.prepare_corpus_cols(chars,
                                                                lens)
            # device_put straight from numpy: shards host->device without
            # staging the full array on device 0 first
            self._dam_b = jax.block_until_ready(
                jax.device_put(bt, dam_shard))
            self._dam_lb = jax.device_put(lt, dam_shard)
            self.lens = jax.device_put(lens, shard1)
        elif metric in _F64_METRICS:
            self.chars = jax.device_put(chars, shard)
            self.lens = jax.device_put(lens, shard1)
            self._lens_host = lens
            self._chars4 = chars[:, :4].copy()   # winkler prefix, host side
            self._fn = jax.jit(_jaro_ops.jaro_components,
                               out_shardings=(shard1, shard1))
        elif metric in _PARTIAL_METRICS:
            # off-TPU partial_ratio: host window sweep over a host corpus
            # copy (windows still batch through the XLA LCS kernel)
            self.lens = jax.device_put(lens, shard1)
            self._lens_host = lens
            self._pchars = self._compact_chars(chars)
            self._fn = None
        else:
            self.chars = jax.device_put(chars, shard)
            self.lens = jax.device_put(lens, shard1)
            if self._weights is not None:
                ins, dele, sub = self._weights
                fn = functools.partial(_lev_ops.weighted_distance,
                                       ins=ins, dele=dele, sub=sub)
            else:
                fn = _distance_fn(metric)
            self._fn = jax.jit(fn, out_shardings=shard1)

    def _pallas_sharded(self, run_fn, scal, tabs, statics: dict, nouts=1,
                        cand3=None):
        """Run a Pallas ``_run`` over the mesh-sharded packed corpus.

        Each shard executes the kernel on its local candidate slice
        (``shard_map`` over the ``data`` axis; query scalars + PM tables
        replicated) — the Pallas path composes with multi-chip meshes
        instead of falling back to the XLA kernels.
        """
        key = (run_fn, tuple(sorted(statics.items())), nouts)
        f = self._smap_cache.get(key)
        if f is None:
            def local(s, tb, c3, l2):
                return run_fn(s, tb, c3, l2, **statics)

            ospec = P("data", None)
            # check_vma off: pallas_call out_shapes carry no vma annotation
            f = jax.jit(jax.shard_map(
                local, mesh=self.mesh,
                in_specs=(P(), P(), P(None, "data", None), P("data", None)),
                out_specs=ospec if nouts == 1 else (ospec,) * nouts,
                check_vma=False))
            self._smap_cache[key] = f
        return f(scal, tabs, self.cand3 if cand3 is None else cand3,
                 self.lb2)

    def _encode_query(self, query):
        q = _codec.encode_one(query)
        if self._vocab is not None:
            idx = np.searchsorted(self._vocab, q).clip(0,
                                                       len(self._vocab) - 1)
            # chars absent from the corpus vocab map to an id no corpus
            # element uses, so they can never match
            miss = self._vocab[idx] != q
            q = np.where(miss, np.int64(len(self._vocab)), idx)
        elif q.size:
            # corpus was NOT vocab-remapped: query chars outside the int32
            # corpus domain can never match any corpus char, so map them
            # to one never-matching sentinel (query-internal equality is
            # irrelevant to every metric).  Without this, downstream
            # pad_batch would remap the query alone and silently break
            # cross-equality with the corpus.
            bad = (q < 0) | (q > np.iinfo(np.int32).max)
            if bad.any():
                q = np.where(bad, np.int64(min(self._cmax + 1,
                                               np.iinfo(np.int32).max)), q)
        return q

    def _jaro_finish(self, common, trans, q):
        """(common, trans) int components -> f64 distances, host-exact."""
        from ..distance import jaro as _jaro_mod

        common, trans = np.asarray(common), np.asarray(trans)
        lens = self._lens_host
        l1 = np.full_like(lens, q.size)
        sim = _jaro_mod.sim_from_components(common, trans, l1, lens)
        if self.metric == "jaro_winkler":
            P = min(4, q.size)
            if P:
                pe = (self._chars4[:, :P] == q[:P]) & \
                     (np.arange(P) < np.minimum(q.size, lens)[:, None])
                prefix = np.cumprod(pe.astype(np.int64), -1).sum(-1)
            else:
                prefix = np.zeros(lens.shape, np.int64)
            boosted = sim + prefix * self.prefix_weight * (1.0 - sim)
            sim = np.where(sim > 0.7, boosted, sim)
        return 1.0 - sim     # distance; host f64, exact

    #: widest query the windowed partial_ratio kernel serves (W <= 2)
    _PARTIAL_MAX_Q = 64

    @staticmethod
    def _compact_chars(chars: np.ndarray) -> np.ndarray:
        """Smallest-dtype host copy of the padded corpus (pads -> 0;
        lengths mask them everywhere the copy is read)."""
        mx = int(chars.max()) if chars.size else 0
        dt = (np.uint8 if mx < 256 else
              np.uint16 if mx < 65536 else np.int32)
        return np.where(chars < 0, 0, chars).astype(dt)

    def _partial_arrays(self, idx=None):
        """Encoded candidate arrays reconstructed from the host copy."""
        lens = self._lens_host
        rng = range(lens.shape[0]) if idx is None else idx
        return [self._pchars[i, :lens[i]].astype(np.int64) for i in rng]

    def _partial_host_all(self, q: np.ndarray) -> np.ndarray:
        from .. import fuzz as _fuzz
        return 1.0 - _fuzz._host_window_scores(q, self._partial_arrays())

    def _partial_dev(self, q, qk, mode, cand3):
        """partial_ratio distances (= 1 - best-window ratio) through the
        windowed Pallas kernel (``ops/pallas/partial_kernel.py``); shorter-
        than-query candidates re-score on the host path (window roles
        swap there), queries beyond the kernel width fall back entirely."""
        from .. import fuzz as _fuzz
        from ..ops.pallas import lev_kernel as _lk
        from ..ops.pallas import partial_kernel as _pk

        m = int(q.size)
        lens = self._lens_host
        if m == 0:
            return (lens > 0).astype(np.float64)
        if m > self._PARTIAL_MAX_Q:
            return self._partial_host_all(q)
        if self._ndev > 1:
            W = max(1, -(-m // 32))
            ntab = 2 if mode == "byte" else 1
            tabs = jnp.asarray(_lk.build_pm_tables(
                np.asarray(qk, np.int32), mode))
            M8, exact = (_pk.quantize_m(m) if not self._interpret
                         else (0, False))
            num, den, _, _ = self._pallas_sharded(
                _pk._run, jnp.array([m], jnp.int32), tabs,
                dict(LB=self._LB, W=W, ntab=ntab, M8=M8, exact=exact,
                     interpret=self._interpret), nouts=4, cand3=cand3)
        else:
            num, den, _, _ = _pk.partial_ratio_1v_many(
                qk, cand3, self.lb2, mode=mode, interpret=self._interpret)
        num = np.asarray(num).reshape(-1).astype(np.float64)
        den = np.asarray(den).reshape(-1).astype(np.float64)
        d = (den - num) / den              # 1 - score, host f64
        idx = np.flatnonzero((lens > 0) & (lens < m))
        if idx.size:
            d[idx] = 1.0 - self._partial_short_batched(q, idx)
        return d

    def _partial_short_batched(self, q: np.ndarray,
                               idx: np.ndarray) -> np.ndarray:
        """Best-window ratios for candidates SHORTER than the query.

        Window roles swap there (the candidate slides over the query,
        fuzz.rs:207-213 semantics), and the clipped window set depends
        only on the candidate LENGTH — so candidates group by length and
        each group scores against its shared ``m + n - 1`` query windows
        in ONE batched device LCS dispatch (no per-candidate Python; the
        round-2 path re-entered ``_best_window`` per candidate).  Scores
        use the same f64 ``1 - dist/total`` finish as the host path, so
        results are bit-identical.
        """
        from .. import fuzz as _fuzz
        from ..ops import dispatch as _dispatch
        from ..ops import lcs as _lcs_ops

        m = int(q.size)
        q64 = np.asarray(q, np.int64)
        if q64.size and (q64.max() > np.iinfo(np.int32).max
                         or q64.min() < 0):
            # out-of-int32 symbol domain: the per-candidate host sweep
            # keeps exact equality through the shared-vocab encoder
            return _fuzz._host_window_scores(q, self._partial_arrays(idx))
        lens = self._lens_host
        out = np.empty(idx.size, np.float64)
        pos = {int(c): k for k, c in enumerate(idx)}
        for n in np.unique(lens[idx]):
            n = int(n)
            grp = idx[lens[idx] == n]
            starts = np.maximum(0, np.arange(1, m + n) - n)
            ends = np.minimum(m, np.arange(1, m + n))
            W = starts.size
            # fixed widths (query <= _PARTIAL_MAX_Q on this route) and
            # pow2-bucketed batches: a handful of compilations total
            # instead of one per (length, group-size) shape
            WPAD = -(-self._PARTIAL_MAX_Q // 32) * 32
            gidx = starts[:, None] + np.arange(WPAD)[None, :]
            wins = np.where(gidx < ends[:, None],
                            q64[np.minimum(gidx, m - 1)], -1).astype(
                                np.int32)
            wlens = (ends - starts).astype(np.int32)
            cands = np.full((grp.size, WPAD), -1, np.int32)
            cands[:, :n] = self._pchars[grp][:, :n]
            best = np.full(grp.size, -1.0)
            cchunk = max(1, (1 << 20) // W)    # pairs per dispatch cap
            for lo in range(0, grp.size, cchunk):
                sl = slice(lo, min(lo + cchunk, grp.size))
                C = sl.stop - sl.start
                c1 = np.repeat(wins, C, axis=0)
                l1 = np.repeat(wlens, C)
                c2 = np.tile(cands[sl], (W, 1))
                l2 = np.full(W * C, n, np.int32)
                npad = 1 << max(W * C - 1, 0).bit_length()
                if npad > W * C:               # zero-len dummy pairs
                    pad = npad - W * C
                    c1 = np.vstack([c1, np.full((pad, WPAD), -1,
                                                np.int32)])
                    c2 = np.vstack([c2, np.full((pad, WPAD), -1,
                                                np.int32)])
                    l1 = np.r_[l1, np.zeros(pad, np.int32)]
                    l2 = np.r_[l2, np.zeros(pad, np.int32)]
                sim = _dispatch.run_pairs(_lcs_ops.lcs_similarity,
                                          c1, l1, c2, l2)[: W * C]
                tot = l1[: W * C].astype(np.int64) + n
                r = 1.0 - ((tot - 2 * sim.astype(np.int64))
                           / np.maximum(tot, 1))
                best[sl] = r.reshape(W, C).max(axis=0)
            for k, c in enumerate(grp):
                out[pos[int(c)]] = best[k]
        return out

    def _distances_dev(self, query, score_cutoff=None, score_hint=None):
        q = self._encode_query(query)
        if self._zero:
            return np.zeros(int(np.prod(self.lb2.shape))
                            if self._pallas else self.lens.shape[0],
                            np.int64)
        if self._dam_pallas and self._dam_long:
            from ..ops.pallas import damerau_kernel as _dk
            if (score_cutoff is not None and 0 <= score_cutoff <= 15
                    and int(score_cutoff) == score_cutoff
                    and self._ndev == 1):
                # cutoff-banded long Damerau: the |i-j| <= k band is
                # length-independent — at 8192 chars / k=15 it touches
                # ~254k of the 67M full-DP cells.  Under a cutoff only
                # |la-lb| <= k candidates can pass, so this is the
                # long-dedup shape.  Seq-layout tiles staged lazily on
                # the first banded scan (device-side transpose of the
                # row tiles) and cached.
                kb = _dk.pick_dam_band(int(score_cutoff), 1 << 30)
                st = getattr(self, "_dam_band_staged", None)
                if st is None:
                    st = self._stage_dam_band()
                bc, lt, lbmax = st
                return _dk.damerau_seqband_long_1v_many(
                    q, bc, lt, lbmax=lbmax, kband=kb,
                    interpret=self._interpret)
            b3 = None
            if self._dam_nb > 48 and self._ndev == 1:
                # streamed-block route: stage the (nb, rows, LANE)
                # layout once instead of paying a corpus-sized
                # transpose per scan
                b3 = getattr(self, "_dam_b3", None)
                if b3 is None:
                    b3 = jax.block_until_ready(
                        jax.jit(_dk.transpose_corpus_long,
                                static_argnums=1)(
                            self._dam_b, self._dam_nb))
                    self._dam_b3 = b3
            try:
                return _dk.damerau_long_1v_many(
                    q, self._dam_b, self._dam_lb, nb=self._dam_nb,
                    sub=self._dam_sub, interpret=self._interpret,
                    mesh=self.mesh if self._ndev > 1 else None, b3=b3)
            except ValueError:         # query beyond the packed-value range
                return self._wide_xla_fallback(q)
        if self._dam_pallas and self._dam_seq:
            from ..ops.pallas import damerau_kernel as _dk
            if score_cutoff is not None and score_cutoff >= 0:
                # cutoff-banded sequential pairs: O(k*M) instead of
                # O(N*M).  The reference uses the cutoff only as a
                # Delta-len guard (damerau_levenshtein.rs:111-168); on
                # device the |i-j| <= k band is the big lever — results
                # above the band come back > kband and are masked
                # invalid by distances(), same (values, valid) contract
                kb = _dk.pick_dam_band(int(score_cutoff),
                                       self._dam_lbmax)
                if kb is not None and int(score_cutoff) == score_cutoff:
                    return _dk.damerau_seqband_1v_many(
                        q, self._dam_b, self._dam_lb,
                        lbmax=self._dam_lbmax, kband=kb,
                        interpret=self._interpret,
                        mesh=self.mesh if self._ndev > 1 else None)
            return _dk.damerau_seq_1v_many(
                q, self._dam_b, self._dam_lb, lbmax=self._dam_lbmax,
                interpret=self._interpret,
                mesh=self.mesh if self._ndev > 1 else None)
        if self._dam_pallas:
            from ..ops.pallas import damerau_kernel as _dk
            return _dk.damerau_1v_many(
                q, self._dam_b, self._dam_lb, seg=self._dam_seg,
                interpret=self._interpret,
                mesh=self.mesh if self._ndev > 1 else None)
        if self._pallas:
            from ..ops.pallas import lev_kernel as _lk
            from ..ops.pallas import lcs_kernel as _ck
            mode = _lk.pick_mode(q, self._cmax)
            cand3 = self.cand3
            qk = q                      # the query the kernels see
            if self._wide:
                qv = _lk.query_vocab(q)
                if qv is None:          # > 127 distinct symbols
                    if self.metric in _PARTIAL_METRICS:
                        return self._partial_host_all(q)
                    return self._wide_xla_fallback(q)
                qvocab128, q_local = qv
                cand3 = self._remap_fn(self._chars_dev,
                                       jnp.asarray(qvocab128))
                qk = q_local
                mode = "local"
            if self.metric in _PARTIAL_METRICS:
                return self._partial_dev(q, qk, mode, cand3)
            if (self.metric == "levenshtein" and self._stream
                    and self._weights is None):
                # streamed band: O(bw) per char regardless of the query's
                # word count; placed before the mesh dispatch so sharded
                # long-bucket scans get it too (same routing rule as the
                # fori-form band: W must clear the band's step cost)
                from ..ops.pallas import band_kernel as _bk
                cut = (None if score_cutoff is None or self._wscale != 1
                       else int(score_cutoff))
                if (cut is None and score_hint is not None
                        and self._wscale == 1 and self._ndev == 1):
                    out = self._lev_hint_scan(qk, mode, cand3,
                                              int(score_hint))
                    if out is not None:
                        return out
                if (cut is not None and 0 <= cut <= _bk.MAX_CUTOFF_FAST
                        and cut < q.size):
                    bw = _bk.band_words(cut)
                    Wq = max(1, -(-int(q.size) // 32))
                    if q.size > 16 * bw - 1 and Wq >= 2 * bw + 1:
                        if self._ndev > 1:
                            ntab = 2 if mode == "byte" else 1
                            stabs = jnp.asarray(_bk.build_shifted_tables(
                                np.asarray(qk, np.int32), mode, self._LB,
                                bw))
                            out = self._pallas_sharded(
                                _bk._run_stream,
                                jnp.array([int(q.size), cut], jnp.int32),
                                stabs,
                                dict(LB=self._LB, ntab=ntab, bw=bw,
                                     interpret=self._interpret),
                                cand3=cand3)
                        else:
                            out = _bk.lev_banded_stream_1v_many(
                                qk.astype(np.int32), cand3, self.lb2,
                                cutoff=cut, mode=mode,
                                interpret=self._interpret)
                        return out.reshape(-1)
            if self._ndev > 1:
                return self._dist_pallas_mesh(qk, mode, cand3, q_finish=q)
            if self.metric == "levenshtein":
                if self._weights is not None:
                    ins, dele, sub = self._weights
                    if self._stream:
                        from ..ops.pallas import stream_kernel as _sk
                        W = max(1, -(-int(q.size) // 32))
                        if W * 32 <= _sk.WLEV_STREAM_MAX_LA:
                            out = _sk.wlev_stream_1v_many(
                                qk.astype(np.int32), cand3, self.lb2,
                                ins=ins, dele=dele, sub_cost=sub,
                                mode=mode, interpret=self._interpret)
                            return out.reshape(-1)
                        # pattern beyond the row-scratch cap: XLA scan
                        # over the unpacked device corpus
                        return self._wide_xla_fallback(q)
                    from ..ops.pallas import wlev_kernel as _wk
                    out = _wk.wlev_1v_many(qk.astype(np.int32), cand3,
                                           self.lb2, ins=ins, dele=dele,
                                           sub_cost=sub, mode=mode,
                                           interpret=self._interpret)
                    return out.reshape(-1)
                if self._stream:
                    # (a cutoff-banded stream scan returns before the
                    # mesh dispatch above)
                    from ..ops.pallas import stream_kernel as _sk
                    out = _sk.lev_stream_1v_many(qk, cand3, self.lb2,
                                                 mode=mode,
                                                 interpret=self._interpret)
                    out = out.reshape(-1)
                    return out * self._wscale if self._wscale != 1 else out
                from ..ops.pallas import band_kernel as _bk
                eff_cut = (None if score_cutoff is None or self._wscale != 1
                           else score_cutoff)
                if (eff_cut is None and score_hint is not None
                        and self._wscale == 1 and not self._stream
                        and self._ndev == 1):
                    out = self._lev_hint_scan(qk, mode, cand3,
                                              int(score_hint))
                    if out is not None:
                        return out
                # cutoff-banded routing: the static table-driven kernel
                # costs ~0.57x a full W=2 step per band word (flat form)
                # or ~1.2x (fori form for longer buckets), while the full
                # kernel's step cost grows with the query's word count W
                # — so the band pays once W clears the band's op cost.
                # Beyond the static kernel's bucket cap the dynamic
                # variant's per-step scalar shifts cost ~2 Myers words,
                # worthwhile only for W >= ~6 (queries > 160 chars).
                LBp = int(cand3.shape[0]) * 4
                band_ok = False
                if (eff_cut is not None
                        and 0 <= eff_cut <= _bk.MAX_CUTOFF_FAST
                        and eff_cut < q.size):
                    bw = _bk.band_words(int(eff_cut))
                    Wq = max(1, -(-int(q.size) // 32))
                    if q.size > 16 * bw - 1 and LBp <= _bk.FAST_MAX_LB:
                        # measured v5e crossovers (experiments/
                        # band_bw_speed.py): flat band per 64 steps costs
                        # ~7.0/9.9/14.3 ms/8M at bw=1/2/3 vs the full
                        # kernel's ~8.1/11.4/20 at W=2/4/8
                        if LBp * bw <= _bk.FLAT_MAX_STEPS:
                            band_ok = Wq >= 2 * bw
                        else:
                            band_ok = Wq >= 2 * bw + 1
                    else:
                        band_ok = (q.size > 160
                                   and eff_cut <= _bk.MAX_CUTOFF)
                if band_ok:
                    # banded fast path: exact when <= cutoff, masked after
                    out = _bk.lev_banded_1v_many(qk.astype(np.int32),
                                                 cand3, self.lb2,
                                                 cutoff=int(eff_cut),
                                                 mode=mode,
                                                 interpret=self._interpret)
                    return out.reshape(-1)
                out = _lk.lev_1v_many(qk, cand3, self.lb2, mode=mode,
                                      interpret=self._interpret)
                if self._wscale != 1:
                    out = out * self._wscale
                return out.reshape(-1)
            if self.metric == "osa":
                if self._stream:
                    from ..ops.pallas import stream_kernel as _sk
                    out = _sk.osa_stream_1v_many(qk, cand3, self.lb2,
                                                 mode=mode,
                                                 interpret=self._interpret)
                    return out.reshape(-1)
                from ..ops.pallas import osa_kernel as _ok
                out = _ok.osa_1v_many(qk, cand3, self.lb2, mode=mode,
                                      interpret=self._interpret)
                return out.reshape(-1)
            if self.metric in _F64_METRICS:
                if self._stream:
                    from ..ops.pallas import stream_kernel as _sk
                    if not _sk.jaro_stream_query_fits(int(q.size),
                                                     self._LB):
                        self._warn_jaro_fallback()
                        return self._wide_xla_fallback(q)
                    common, trans = _sk.jaro_stream_1v_many(
                        qk.astype(np.int32), cand3, self.lb2, mode=mode,
                        interpret=self._interpret)
                else:
                    from ..ops.pallas import jaro_kernel as _jk
                    common, trans = _jk.jaro_1v_many(
                        qk.astype(np.int32), cand3, self.lb2, mode=mode,
                        interpret=self._interpret)
                return self._jaro_finish(common.reshape(-1),
                                         trans.reshape(-1), q)
            if not self._stream:
                # cutoff-banded LCS route (indel.rs:80-104 ->
                # lcs_seq.rs:267-341): an indel cutoff bounds the LCS DP
                # to a diagonal band; an lcs_seq cutoff k admits indel
                # <= 2k.  Same crossover rule as the lev band (the band
                # step costs ~1.5x a Myers word): route once the query's
                # word count clears twice the band's.  Byte mode needs a
                # NUL-free query (candidate padding is byte 0, and the
                # banded kernel relies on pads never matching; local
                # mode maps pads to the always-empty MISS row).
                from ..ops.pallas import lcs_band_kernel as _cbk
                eff = (None if score_cutoff is None or self._wscale != 1
                       else int(score_cutoff))
                band_cut = (eff if self.metric == "indel"
                            else None if eff is None else 2 * eff)
                if (band_cut is not None
                        and 0 <= band_cut <= _cbk.MAX_CUTOFF
                        and int(cand3.shape[0]) * 4 <= _cbk.FAST_MAX_LB
                        and (mode == "local"
                             or not bool(np.any(np.asarray(qk) == 0)))):
                    bw = _cbk.band_words(band_cut)
                    Wq = max(1, -(-int(q.size) // 32))
                    # measured v5e with staging amortized (evidence/
                    # lcs_band_speed_r4.log): every bw wins from Wq >= 8
                    # (256 chars: 1.13-1.35x; 512: 1.23-1.54x, incl.
                    # bw=3) and loses at Wq=2 (0.78-0.92x) — route on
                    # query width alone
                    if Wq >= 8:
                        sim = np.asarray(_cbk.lcs_banded_1v_many(
                            np.asarray(qk, np.int32), cand3, self.lb2,
                            cutoff=band_cut, mode=mode, cmax=self._cmax,
                            interpret=self._interpret)).reshape(-1)
                        la = q.size
                        lb = np.asarray(self.lens).astype(np.int64)
                        if self.metric == "indel":
                            d = la + lb - 2 * sim
                            return (d * self._wscale
                                    if self._wscale != 1 else d)
                        return np.maximum(la, lb) - sim
            if self._stream:
                from ..ops.pallas import lcs_band_kernel as _cbk
                from ..ops.pallas import stream_kernel as _sk
                eff = (None if score_cutoff is None or self._wscale != 1
                       else int(score_cutoff))
                band_cut = (eff if self.metric == "indel"
                            else None if eff is None else 2 * eff)
                if (band_cut is not None
                        and 0 <= band_cut <= _cbk.MAX_CUTOFF
                        and _cbk.band_words(band_cut) <= 2
                        and max(1, -(-int(q.size) // 32)) >= 8
                        and (mode == "local"
                             or not bool(np.any(np.asarray(qk) == 0)))):
                    sim = np.asarray(_cbk.lcs_banded_stream_1v_many(
                        np.asarray(qk, np.int32), cand3, self.lb2,
                        cutoff=band_cut, mode=mode, cmax=self._cmax,
                        interpret=self._interpret)).reshape(-1)
                else:
                    sim = _sk.lcs_stream_1v_many(
                        qk, cand3, self.lb2, mode=mode,
                        interpret=self._interpret).reshape(-1)
            else:
                sim = _ck.lcs_1v_many(qk, cand3, self.lb2, mode=mode,
                                      interpret=self._interpret).reshape(-1)
            la = q.size
            lb = self.lens.astype(jnp.int32)
            if self.metric == "indel":
                d = la + lb - 2 * sim
                return d * self._wscale if self._wscale != 1 else d
            return jnp.maximum(la, lb) - sim            # lcs_seq
        if self.metric in _PARTIAL_METRICS:
            return self._partial_host_all(q)
        qc, ql = _codec.pad_batch([q])
        if self.metric in _F64_METRICS:
            common, trans = self._fn(qc, ql, self.chars, self.lens)
            return self._jaro_finish(common, trans, q)
        d = self._fn(qc, ql, self.chars, self.lens)
        return d * self._wscale if self._wscale != 1 else d

    def _lev_hint_scan(self, qk, mode, cand3, hint):
        """Two-pass hint scan (the reference's score-hint ladder,
        ``levenshtein.rs:1069-1088``, in device form): pass 1 runs the
        cheap banded kernel at the hint; candidates the band rejected are
        compacted into a small dense batch for one full-kernel pass, so a
        good hint resolves almost the whole corpus at the band rate while
        every returned distance stays exact.  Returns None when the hint
        isn't band-eligible (caller falls through to the full kernel)."""
        from ..ops.pallas import band_kernel as _bk
        from ..ops.pallas import lev_kernel as _lk
        from ..ops.pallas import stream_kernel as _sk

        stream = self._stream
        q = np.asarray(qk)
        cut = max(1, min(int(hint), _bk.MAX_CUTOFF_FAST))
        bw = _bk.band_words(cut)
        LBp = int(cand3.shape[0]) * 4
        Wq = max(1, -(-int(q.size) // 32))
        if stream:
            # streamed band pass (>1024-char buckets): same routing rule
            # as the cutoff path — W must clear the fori-form band cost
            if not (cut < q.size and q.size > 16 * bw - 1
                    and Wq >= 2 * bw + 1):
                return None
            band = np.array(_bk.lev_banded_stream_1v_many(
                q.astype(np.int32), cand3, self.lb2, cutoff=cut,
                mode=mode, interpret=self._interpret)).reshape(-1)
        else:
            if not (cut < q.size and q.size > 16 * bw - 1
                    and LBp <= _bk.FAST_MAX_LB and Wq >= 2 * bw):
                return None
            band = np.array(_bk.lev_banded_1v_many(
                q.astype(np.int32), cand3, self.lb2, cutoff=cut, mode=mode,
                interpret=self._interpret)).reshape(-1)
        idx = np.flatnonzero(band >= _bk.BIG)
        if idx.size == 0:
            return band
        # compact the stragglers: gather their packed columns into a
        # dense sub-corpus (padded to a whole 4096-candidate tile)
        n = max(4096, int(-(-idx.size // 4096) * 4096))
        idx_pad = np.full(n, int(idx[0]), np.int64)
        idx_pad[: idx.size] = idx
        ip = jnp.asarray(idx_pad)
        R = cand3.shape[1] * 128
        c2d = cand3.reshape(cand3.shape[0], R)
        sub_c3 = jnp.take(c2d, ip, axis=1).reshape(cand3.shape[0],
                                                   n // 128, 128)
        sub_lb = jnp.take(self.lb2.reshape(-1), ip).reshape(n // 128, 128)
        full_fn = _sk.lev_stream_1v_many if stream else _lk.lev_1v_many
        full = np.asarray(full_fn(
            q, sub_c3, sub_lb, mode=mode,
            interpret=self._interpret)).reshape(-1)
        band[idx] = full[: idx.size]
        return band

    def _band_auto_cut(self, query):
        """Cheapest band cutoff the routing would actually accelerate for
        this query, or None (mirrors the banded conditions in
        ``_distances_dev``)."""
        if not (self._pallas and self._ndev == 1 and not self._stream
                and self.metric == "levenshtein"
                and self._weights is None and self._wscale == 1
                and not self._dam_pallas):
            return None
        from ..ops.pallas import band_kernel as _bk
        qsize = int(_codec.encode_one(query).size)
        if self._wide and qsize > 127:
            # query may exceed the 128-entry local-remap vocab and drop
            # to the XLA fallback, where a band pre-pass buys nothing
            return None
        LBp = self._LB
        Wq = max(1, -(-qsize // 32))
        for cut in (_bk.MAX_CUTOFF, 31, _bk.MAX_CUTOFF_FAST):
            bw = _bk.band_words(cut)
            if not (cut < qsize and qsize > 16 * bw - 1
                    and LBp <= _bk.FAST_MAX_LB):
                continue
            if LBp * bw <= _bk.FLAT_MAX_STEPS:
                if Wq >= 2 * bw:
                    return cut
            elif Wq >= 2 * bw + 1:
                return cut
        return None

    def _stage_dam_band(self):
        """Seq-layout tiles for the banded long-Damerau route, built
        once on device from the resident row tiles (adds one corpus-
        sized buffer; only materialized when a banded scan happens)."""
        from ..ops.pallas import damerau_kernel as _dk

        sub, LANE = _dk.SEQ_SUB, 128
        x = self._dam_b
        lens = self.lens
        B8, nbL = int(x.shape[0]), int(x.shape[1])
        CH = _dk.DAM_BAND_CHUNK
        lbmax = -(-nbL // CH) * CH
        Bp = -(-B8 // (sub * LANE)) * (sub * LANE)

        gr_rows = sub * LANE
        ngr = Bp // gr_rows

        # group-at-a-time build into a donated buffer: a single jitted
        # transpose would materialize ~3 corpus-sized buffers at once
        # next to the resident row tiles (the indelband bench OOM'd the
        # same way, evidence/bench_r5_indelband2.log) — here the
        # transient is one 2048-row group (~64 MB at 8192 chars)
        @jax.jit
        def build_group(xg):
            xp = jnp.full((gr_rows, lbmax), -2, jnp.int32)
            xp = xp.at[:, :nbL].set(xg)
            return jnp.transpose(xp.reshape(sub, LANE, lbmax),
                                 (2, 0, 1))

        place = jax.jit(
            lambda buf, part, g: jax.lax.dynamic_update_slice(
                buf, part, (g * lbmax, 0, 0)), donate_argnums=0)
        bc = jnp.full((ngr * lbmax, sub, LANE), -2, jnp.int32)
        for g in range(ngr):
            lo = g * gr_rows
            rows = x[lo: lo + gr_rows]
            if int(rows.shape[0]) < gr_rows:
                rows = jnp.concatenate(
                    [rows, jnp.full((gr_rows - int(rows.shape[0]), nbL),
                                    -2, jnp.int32)])
            bc = place(bc, build_group(rows), g)
        ln = jnp.zeros((Bp,), jnp.int32).at[:B8].set(
            lens.astype(jnp.int32))
        lt = ln.reshape(ngr, sub, LANE)
        st = (jax.block_until_ready(bc), lt, lbmax)
        self._dam_band_staged = st
        return st

    def _warn_jaro_fallback(self):
        """Long query x long jaro bucket exceeds the stream kernel's
        VMEM scratch (the W-word query flags scale with the query) —
        warn once per scanner that the scan leaves the Pallas path
        (still exact, served by the XLA jaro kernel)."""
        if not getattr(self, "_jaro_fb_warned", False):
            self._jaro_fb_warned = True
            import warnings
            warnings.warn(
                "jaro query too long for the streamed device kernel at "
                f"this bucket length ({self._LB}); using the slower XLA "
                "path (results are identical)", RuntimeWarning,
                stacklevel=3)

    def _wide_xla_fallback(self, q):
        """XLA-kernel scan for wide-alphabet queries with > 127 distinct
        symbols (the query-local remap needs a 128-entry table); runs on
        the same sorted device corpus the Pallas path remaps."""
        shard1 = NamedSharding(self.mesh, P("data"))
        fn = getattr(self, "_wide_fb_fn", None)
        if fn is None:
            if self.metric in _F64_METRICS:
                fn = jax.jit(_jaro_ops.jaro_components,
                             out_shardings=(shard1, shard1))
            elif self._weights is not None:
                ins, dele, sub = self._weights
                fn = jax.jit(functools.partial(
                    _lev_ops.weighted_distance, ins=ins, dele=dele,
                    sub=sub), out_shardings=shard1)
            else:
                fn = jax.jit(_distance_fn(self.metric),
                             out_shardings=shard1)
            self._wide_fb_fn = fn
        chars_bl = getattr(self, "_wide_chars_bl", None)
        if chars_bl is None:
            # [LB, B/128, 128] kernel layout -> the [B, LB] the XLA
            # kernels take; built once, only when this rare path runs
            cd = getattr(self, "_chars_dev", None)
            if cd is None:
                # byte-packed pallas corpus: unpack [LB/4, R, 128] u32
                # to [LB, R, 128] chars (pads are 0 but sit past each
                # candidate's length, which the XLA kernels mask)
                c4 = self.cand3
                parts = [((c4 >> jnp.uint32(8 * u))
                          & jnp.uint32(0xFF)).astype(jnp.int32)
                         for u in range(4)]
                cd = jnp.stack(parts, axis=1).reshape(
                    self._LB, *c4.shape[1:])
            LB = cd.shape[0]
            chars_bl = jnp.transpose(cd.reshape(LB, -1), (1, 0))
            self._wide_chars_bl = chars_bl = jax.device_put(
                chars_bl, NamedSharding(self.mesh, P("data", None)))
        qc, ql = _codec.pad_batch([q])
        if self.metric in _F64_METRICS:
            common, trans = fn(qc, ql, chars_bl, self.lens)
            return self._jaro_finish(np.asarray(common), np.asarray(trans),
                                     q)
        d = fn(qc, ql, chars_bl, self.lens)
        return d * self._wscale if self._wscale != 1 else d

    def _dist_pallas_mesh(self, q, mode, cand3=None, q_finish=None):
        """Pallas scan over a multi-device mesh (per-shard kernels).

        ``q`` is the query as the kernels see it (query-local ids on the
        wide-alphabet path); ``q_finish`` the original query for the
        host-side Jaro finish (prefix compares use original chars).
        """
        from ..ops.pallas import jaro_kernel as _jk
        from ..ops.pallas import lev_kernel as _lk
        from ..ops.pallas import osa_kernel as _ok
        from ..ops.pallas import wlev_kernel as _wk

        if q_finish is None:
            q_finish = q
        la = int(q.size)
        q32 = q.astype(np.int32)
        LB = self._LB
        W = max(1, -(-max(la, 1) // 32))
        ntab = 2 if mode == "byte" else 1
        tabs = jnp.asarray(_lk.build_pm_tables(q32, mode))
        scal = jnp.array([la], jnp.int32)
        unroll = _lk.pick_unroll(LB)
        lens = self.lens.astype(jnp.int32)

        if self.metric == "levenshtein" and self._weights is not None:
            ins, dele, sub = self._weights
            scal4 = jnp.array([la, ins, dele, sub], jnp.int32)
            if self._stream:
                from ..ops.pallas import stream_kernel as _sk
                if W * 32 > _sk.WLEV_STREAM_MAX_LA:
                    return self._wide_xla_fallback(q_finish)
                out = self._pallas_sharded(
                    _sk._wlev_run, scal4, tabs,
                    dict(LA=W * 32, LB=LB, W=W, ntab=ntab,
                         interpret=self._interpret), cand3=cand3)
                return out.reshape(-1)
            out = self._pallas_sharded(
                _wk._run, scal4, tabs,
                dict(LA=W * 32, LB=LB, W=W, ntab=ntab,
                     interpret=self._interpret), cand3=cand3)
            return out.reshape(-1)
        if la == 0:
            if self.metric == "lcs_seq":
                return lens
            if self.metric == "indel":
                return lens * self._wscale
            if self.metric in _F64_METRICS:
                return self._jaro_finish(
                    np.zeros(lens.shape[0], np.int32),
                    np.zeros(lens.shape[0], np.int32), q_finish)
            return (lens * self._wscale).astype(jnp.int32)  # lev/osa
        if self.metric == "levenshtein":
            if self._stream:
                from ..ops.pallas import stream_kernel as _sk
                run_fn = _sk._run
            else:
                run_fn = _lk._run
            out = self._pallas_sharded(
                run_fn, scal, tabs,
                dict(LB=LB, W=W, ntab=ntab, unroll=unroll,
                     interpret=self._interpret), cand3=cand3)
            out = out.reshape(-1)
            return out * self._wscale if self._wscale != 1 else out
        if self.metric == "osa":
            if self._stream:
                from ..ops.pallas import stream_kernel as _sk
                run_fn = _sk._osa_run
            else:
                run_fn = _ok._run
            out = self._pallas_sharded(
                run_fn, scal, tabs,
                dict(LB=LB, W=W, ntab=ntab, unroll=unroll,
                     interpret=self._interpret), cand3=cand3)
            return out.reshape(-1)
        if self.metric in _F64_METRICS:
            if self._stream:
                from ..ops.pallas import stream_kernel as _sk
                if not _sk.jaro_stream_query_fits(la, LB):
                    self._warn_jaro_fallback()
                    return self._wide_xla_fallback(q_finish)
                scal_q = np.full(1 + W * 32, -3, np.int32)
                scal_q[0] = la
                scal_q[1:1 + la] = np.asarray(q32, np.int32)
                common, trans = self._pallas_sharded(
                    _sk._jaro_run, jnp.asarray(scal_q), tabs,
                    dict(LB=LB, W=W, ntab=ntab,
                         interpret=self._interpret),
                    nouts=2, cand3=cand3)
            else:
                common, trans = self._pallas_sharded(
                    _jk._run, scal, tabs,
                    dict(LB=LB, W=W, ntab=ntab,
                         interpret=self._interpret),
                    nouts=2, cand3=cand3)
            return self._jaro_finish(np.asarray(common).reshape(-1),
                                     np.asarray(trans).reshape(-1),
                                     q_finish)
        sim = self._pallas_sharded(
            _lcs_stream_run if self._stream else _lcs_run, scal, tabs,
            dict(LB=LB, W=W, ntab=ntab, unroll=unroll,
                     interpret=self._interpret), cand3=cand3).reshape(-1)
        if self.metric == "indel":
            d = la + lens - 2 * sim
            return d * self._wscale if self._wscale != 1 else d
        return jnp.maximum(la, lens) - sim               # lcs_seq

    def distances(self, query, *, score_cutoff=None, score_hint=None):
        """Distances to every corpus string.

        Without ``score_cutoff``: a plain array.  With it: a
        ``(values, valid)`` :class:`BatchResult` — the batch rendering of
        the reference's ``Option`` results (``common.rs:33-46``); on TPU a
        small integer cutoff runs the banded kernel.  ``score_hint``
        (uniform Levenshtein, no cutoff) never changes results but routes
        a two-pass banded-then-compact scan — the device form of the
        reference's hint ladder (``levenshtein.rs:1069-1088``).
        """
        from ..ops import dispatch as _dispatch
        from .. import common as _c

        d = np.asarray(self._distances_dev(query, score_cutoff,
                                           score_hint))
        if self._order is not None:
            # every device path on the sorted route must return the padded
            # length (== the sort permutation's size) for the unsort to be
            # valid — guards the _zero/banded/weighted shortcut shapes
            assert d.shape == self._order.shape, (d.shape, self._order.shape)
            out = np.empty(d.shape, d.dtype)
            out[self._order] = d
            d = out[: self.n]
        else:
            d = d[: self.n]
        if score_cutoff is None:
            return d
        return _dispatch.BatchResult(*_c.mask_distance(d, score_cutoff))

    NQ_GROUP = 16  # queries per multi-query dispatch: 16-query
    # chains sustain ~1.38G pairs/s on v5e (== the pure-kernel
    # rate; 8 gave 1.35G) by sharing each corpus tile fetch

    @staticmethod
    def _topk_host(d: np.ndarray, orig: np.ndarray, k: int):
        """Deterministic host top-k: smallest k by (distance, original
        corpus index).  Plain ``argpartition[:k]`` picks arbitrary members
        of a tie set straddling the k boundary, so different spaces
        (sorted vs original) would return different ids; widening to the
        tie boundary before ordering makes every caller agree."""
        if k >= d.size:
            cand = np.arange(d.size)
        else:
            part = np.argpartition(d, k - 1)[:k]
            cand = np.nonzero(d <= d[part].max())[0]
        cand = cand[np.lexsort((orig[cand], d[cand]))][:k]
        return cand

    def _nq_eligible(self) -> bool:
        """scan_many can batch queries into one multi-query kernel dispatch
        when a uniform Levenshtein / indel / lcs_seq Pallas path is active
        on one device (the corpus tiles are query-independent there; the
        wide-alphabet route remaps the corpus per query and cannot share
        a dispatch)."""
        return (self._pallas and self._ndev == 1 and not self._wide
                and self.metric in ("levenshtein", "indel", "lcs_seq",
                                    "osa", "jaro", "jaro_winkler")
                and self._weights is None
                and not self._stream and not self._zero
                and not getattr(self, "_dam_pallas", False))

    def _distances_many(self, queries):
        """[len(queries), n] distances via grouped multi-query dispatches.

        Queries are encoded, grouped by (word bucket, PM mode), padded to
        :data:`NQ_GROUP` by repeating the group's last query (one
        compilation serves every group; padded rows are dropped), and run
        through ``lev_kernel.lev_nq_many`` — the ``BatchComparator`` PM
        reuse pattern (``levenshtein.rs:1625-1657``) extended to many
        queries per kernel launch.  Sustains ~1.35G pairs/s on v5e vs
        ~1.1G for one-query-per-dispatch scans.
        """
        from ..ops.pallas import jaro_kernel as _jk
        from ..ops.pallas import lcs_kernel as _ck
        from ..ops.pallas import lev_kernel as _lk
        from ..ops.pallas import osa_kernel as _ok

        metric = self.metric
        jaro = metric in _F64_METRICS
        enc = [self._encode_query(q) for q in queries]
        out = np.zeros((len(enc), self.n),
                       np.float64 if jaro else np.int64)
        groups: dict = {}
        for i, q in enumerate(enc):
            w = max(1, -(-q.size // 32))
            groups.setdefault((w, _lk.pick_mode(q, self._cmax)),
                              []).append(i)
        for (w, mode), idxs in groups.items():
            for s in range(0, len(idxs), self.NQ_GROUP):
                part = idxs[s: s + self.NQ_GROUP]
                qs = [enc[i] for i in part]
                qs = qs + [qs[-1]] * (self.NQ_GROUP - len(qs))
                if jaro:
                    cm, tr = _jk.jaro_nq_many(qs, self.cand3, self.lb2,
                                              mode=mode,
                                              interpret=self._interpret)
                    cm = np.asarray(cm).reshape(self.NQ_GROUP, -1)
                    tr = np.asarray(tr).reshape(self.NQ_GROUP, -1)
                    # the Jaro finish (and Winkler prefix boost) runs in
                    # SORTED space: _lens_host/_chars4 are sorted-order;
                    # padded rows are dropped so only real queries finish
                    d = np.stack([self._jaro_finish(cm[r], tr[r], enc[i])
                                  for r, i in enumerate(part)])
                else:
                    nq_fn = {"levenshtein": _lk.lev_nq_many,
                             "osa": _ok.osa_nq_many}.get(metric,
                                                         _ck.lcs_nq_many)
                    d = nq_fn(qs, self.cand3, self.lb2, mode=mode,
                              interpret=self._interpret)
                    d = np.asarray(d).reshape(self.NQ_GROUP, -1)
                    if metric == "levenshtein" and self._wscale != 1:
                        d = d * self._wscale
                for row, i in enumerate(part):
                    r = d[row]
                    if self._order is not None:
                        assert r.shape == self._order.shape
                        un = np.empty(r.shape, r.dtype)
                        un[self._order] = r
                        r = un
                    r = r[: self.n]
                    if metric in ("indel", "lcs_seq"):
                        # r holds LCS lengths; finish per metric on the
                        # corpus-order host lengths
                        la = enc[i].size
                        if metric == "indel":
                            r = la + self.lengths - 2 * r
                            if self._wscale != 1:
                                r = r * self._wscale
                        else:                           # lcs_seq
                            r = np.maximum(la, self.lengths) - r
                    out[i] = r
        return out

    def _ckpt_fingerprint(self, queries) -> str:
        """Corpus+queries+metric content hash stored in checkpoints."""
        qh = hashlib.sha1()
        for s in queries:
            qh.update(_codec.encode_one(s).tobytes())
            qh.update(b";")
        return f"{self._fingerprint}:{qh.hexdigest()}:{self.metric}"

    def scan_many(self, queries, *, k: int | None = None,
                  checkpoint_path: str | None = None,
                  checkpoint_every: int = 256):
        """Scan a stream of queries; optionally checkpoint + resume.

        Returns ``[nq, n]`` distances (or, with ``k``, a pair of
        ``[nq, k]`` value/index arrays).  With ``checkpoint_path``,
        partial results are written every ``checkpoint_every`` queries and
        an interrupted run resumes from the last checkpoint — the
        SURVEY.md §5 note: the only state worth persisting is partial scan
        output; corpus/PM state is cheap to rebuild, exactly like the
        reference's ``BatchComparator``.
        """
        queries = list(queries)
        nq = len(queries)
        done = 0
        if k is None:
            vals = np.zeros((nq, self.n), np.float64)
            ids = None
        else:
            vals = np.full((nq, k), np.inf)
            ids = np.full((nq, k), -1, np.int64)
        # content fingerprint: shape equality alone would silently splice
        # results from a different corpus/query list of the same sizes
        fp = self._ckpt_fingerprint(queries)
        if checkpoint_path is not None and os.path.exists(checkpoint_path):
            ck = np.load(checkpoint_path)
            if int(ck["n"]) == self.n and int(ck["nq"]) == nq \
                    and (k or 0) == int(ck["k"]) \
                    and str(ck.get("fp", "")) == fp:
                done = int(ck["done"])
                vals[:done] = ck["vals"][:done]
                if ids is not None:
                    ids[:done] = ck["ids"][:done]

        def _save(done):
            if checkpoint_path is None:
                return
            tmp = checkpoint_path + ".tmp.npz"
            np.savez(tmp, n=self.n, nq=nq, k=k or 0, done=done, vals=vals,
                     ids=ids if ids is not None else np.empty(0), fp=fp)
            os.replace(tmp, checkpoint_path)

        if self._nq_eligible() and nq - done > 1:
            # grouped multi-query dispatches between checkpoint boundaries
            qi = done
            while qi < nq:
                stop = min(nq, (qi // checkpoint_every + 1)
                           * checkpoint_every)
                d = self._distances_many(queries[qi:stop])
                if k is None:
                    vals[qi:stop] = d
                else:
                    kk = min(k, self.n)
                    for r, row in enumerate(d):
                        rd = row.astype(np.float64)
                        sel = self._topk_host(rd, np.arange(rd.size), kk)
                        vals[qi + r, : len(sel)] = row[sel]
                        ids[qi + r, : len(sel)] = sel
                qi = stop
                if checkpoint_path is not None and qi < nq:
                    _save(qi)
        else:
            for qi in range(done, nq):
                if k is None:
                    vals[qi] = self.distances(queries[qi])
                else:
                    v, i = self.topk(queries[qi], k)
                    vals[qi, : len(v)] = v
                    ids[qi, : len(i)] = i
                if checkpoint_path is not None \
                        and (qi + 1) % checkpoint_every == 0:
                    _save(qi + 1)
        _save(nq)
        return vals if k is None else (vals, ids)

    def topk(self, query, k: int, *, score_cutoff=None):
        """(distances[k], corpus_indices[k]) of the k nearest strings.

        With ``score_cutoff``, entries above the cutoff are excluded
        (fewer than ``k`` results may return).
        """
        if k <= 0:
            return np.empty(0), np.empty(0, np.int32)
        if score_cutoff is not None:
            res = self.distances(query, score_cutoff=score_cutoff)
            vals, valid = res.values, res.valid
            d = np.where(valid, vals.astype(np.float64), np.inf)
            k = min(k, int(valid.sum()))
            if k == 0:
                return np.empty(0, vals.dtype), np.empty(0, np.int32)
            ids = self._topk_host(d, np.arange(d.size), k)
            return vals[ids], ids.astype(np.int32)
        # auto-band: top-k only needs the NEAREST candidates, so try the
        # ~1.8x banded kernel first; if >= k candidates land under the
        # band, nothing outside it can displace them (exact), otherwise
        # fall through to the full scan
        cut = self._band_auto_cut(query)
        if cut is not None:
            res = self.distances(query, score_cutoff=cut)
            nv = int(res.valid.sum())
            if nv >= min(k, self.n):
                d = np.where(res.valid, res.values.astype(np.float64),
                             np.inf)
                ids = self._topk_host(d, np.arange(d.size), min(k, nv))
                return res.values[ids], ids.astype(np.int32)
        dist = self._distances_dev(query)
        if self._order is not None:
            # sorted space: mask padding rows, host top-k, map ids back
            # (ties break on the ORIGINAL corpus index so results match
            # the grouped scan_many path)
            d = np.asarray(dist, np.float64)
            d = np.where(self._valid, d, np.inf)
            k = min(k, self.n)
            ids = self._topk_host(d, self._order, k)
            vals = d[ids]
            if not np.issubdtype(np.asarray(dist).dtype, np.floating):
                vals = vals.astype(np.int64)
            return vals, self._order[ids].astype(np.int32)
        if isinstance(dist, np.ndarray):    # host f64 path (jaro family)
            d = dist[: self.n]
            k = min(k, d.size)
            ids = np.argpartition(d, k - 1)[:k] if k < d.size \
                else np.arange(d.size)
            ids = ids[np.lexsort((ids, d[ids]))]
            return d[ids], ids.astype(np.int32)
        # mask the alignment-padding rows; k clamps to the real corpus
        # size so padding rows can never surface (empty corpus -> empty)
        k = min(k, self.n)
        if k == 0:
            return np.empty(0, np.int64), np.empty(0, np.int32)
        idx = jnp.arange(dist.shape[0], dtype=jnp.int32)
        masked = jnp.where(idx < self.n, dist.astype(jnp.float32), jnp.inf)
        vals, ids = topk_merge(masked, idx, k, self.mesh, largest=False)
        return np.asarray(vals).astype(np.int64), np.asarray(ids)
