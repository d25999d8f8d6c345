"""Cross-read batched alignment: schedule many reads' extension-job waves
into shared device kernel calls.

This is the TPU-native replacement for the reference's per-region sequential
ksw2 calls inside the result threads (map.c:816-898 -> align.c): every read's
align_skeleton runs as a generator (align.align_skeleton_gen) that yields
waves of extension jobs whose inputs depend only on the chain anchors; the
scheduler gathers the current wave of EVERY in-flight read, runs one batched
Pallas extd2 call per size bucket (ops/ksw2_pallas.py), and resumes the
generators with result thunks.  Jobs outside the device kernel's domain
(splice, the single-affine extz path, oversized or empty sequences) run on
the host NumPy model lazily, so output stays byte-identical either way."""
from __future__ import annotations

import numpy as np

from .. import constants as C
from ..ops import ksw2 as K
from ..align import _host_thunk

# device-domain caps (VMEM sizing of the extd2 kernel's state arrays)
MAX_TLEN = 16384
MAX_QLEN = 16384
MIN_DEV_JOBS = 4     # tiny waves aren't worth a device launch
# above this threshold the native one-call skeleton driver disengages so
# the wave scheduler sees the jobs (see _sync_native_skeleton)
_NATIVE_MAX_DEFAULT = 100000


class DeviceAlignExecutor:
    """Executes extension-job waves: batched Pallas extd2 for eligible jobs,
    lazy host NumPy for the rest."""

    def __init__(self, opt, interpret: bool = False,
                 use_device: bool = True):
        import os
        self.opt = opt
        self.interpret = interpret
        # use_device=False = pure-host executor (HostRuntime): native SIMD
        # batches + lazy host model only, no jax import anywhere
        self.use_device = use_device
        # measured crossover routing: sub-threshold extd2 jobs run on the
        # host SIMD path (native/ksw2_extd2.cc — the reference's own ksw2
        # placement, CPU SIMD) where one device round trip costs more than
        # the whole problem; the Pallas kernel takes what's left.  On a
        # co-located host lower this to shift work back to the device.
        self.native_max = int(os.environ.get("MM2TPU_NATIVE_EXT_MAX",
                                             str(_NATIVE_MAX_DEFAULT)))
        # interpret mode (CPU tests) keeps the device path covered but
        # routes big problems to the host model, which is much faster there
        self.max_span = 768 if interpret else MAX_QLEN + MAX_TLEN
        self.mat = K.gen_simple_mat(5, opt.a, opt.b)
        # splice uses the exts2 kernel mode; genomic scoring uses extd2
        # unless it degenerates to the single-affine extz path (q==q2,
        # e==e2); both kernels assume the reference's early-return
        # precondition -min(mat) <= 2*(q+e) (ksw2_extd2_sse.c:91-92)
        self.splice = bool(opt.flag & C.MM_F_SPLICE)
        if self.splice:
            self.enabled = opt.q2 > opt.q + opt.e \
                and -int(self.mat.min()) <= 2 * (opt.q + opt.e)
        else:
            self.enabled = not (opt.q == opt.q2 and opt.e == opt.e2) \
                and -int(self.mat.min()) <= 2 * min(opt.q + opt.e,
                                                    opt.q2 + opt.e2)
        self.n_device = 0
        self.n_host = 0
        self.n_native = 0
        import threading
        self._stat_lock = threading.Lock()  # two map_stream batch threads
        self._warm: set = set()             # bucket shapes already compiled
        from ..utils.device_guard import DEFAULT_TIMEOUT_S
        self.timeout = DEFAULT_TIMEOUT_S

    def _sync_native_skeleton(self):
        # the one-call-per-read native align driver (align_driver.cc) only
        # engages when every extension job would route to host SIMD anyway;
        # lowering native_max re-enables wave scheduling so the device
        # kernel sees the jobs. NB: only ever widens skeleton use back to
        # the default — an embedder's explicit opt.native_skeleton = False
        # (e.g. the CLI's -A debug dumps) is preserved.
        if self._native_max < _NATIVE_MAX_DEFAULT:
            self.opt.native_skeleton = False

    @property
    def native_max(self):
        return self._native_max

    @native_max.setter
    def native_max(self, v):
        self._native_max = int(v)
        self._sync_native_skeleton()

    def _eligible(self, job) -> bool:
        if not self.enabled:
            return False
        ql, tl = len(job["qseq"]), len(job["tseq"])
        return 0 < ql <= MAX_QLEN and 0 < tl <= MAX_TLEN \
            and ql + tl <= self.max_span

    def run(self, jobs) -> list:
        thunks: list = [None] * len(jobs)
        # sub-threshold jobs: one native SIMD batch call (same callee
        # family either way — exts2 for splice scoring, extd2 otherwise;
        # the single-affine q==q2,e==e2 case has no native batch kernel)
        if self.splice:
            from ..native import exts2_batch_native as nat_fn
            nat_args = (self.opt.q, self.opt.e, self.opt.q2,
                        self.opt.noncan)
        elif not (self.opt.q == self.opt.q2 and self.opt.e == self.opt.e2):
            from ..native import extd2_batch_native as nat_fn
            nat_args = (self.opt.q, self.opt.e, self.opt.q2, self.opt.e2)
        else:
            nat_fn = None
        if nat_fn is not None:
            nat = [i for i, j in enumerate(jobs)
                   if len(j["qseq"]) + len(j["tseq"]) <= self.native_max]
            if nat:
                res = nat_fn([jobs[i] for i in nat], self.mat, *nat_args)
                if res is not None:
                    for i, ez in zip(nat, res):
                        thunks[i] = (lambda v=ez: v)
                    with self._stat_lock:
                        self.n_native += len(nat)
        dev = [i for i, j in enumerate(jobs)
               if thunks[i] is None and self._eligible(j)] \
            if self.use_device else []
        if len(dev) >= MIN_DEV_JOBS:
            from ..ops import ksw2_pallas as KP
            # bucket by padded problem size to bound compiled kernel shapes
            by_bucket: dict[int, list[int]] = {}
            for i in dev:
                j = jobs[i]
                sz = KP._pow2_at_least(len(j["qseq"]) + len(j["tseq"]), 256)
                by_bucket.setdefault(sz, []).append(i)
            # the on-chip backtrack keeps the p matrix on device (big win on
            # transfer-limited links); the interpreted walker is slow, so
            # CPU test runs keep the host decode
            bt = "host" if self.interpret else "device"
            # staged dispatch/collect: launch every bucket's forward kernel
            # before blocking on any result, so the device works on bucket
            # k+1 while the host reads scores / decodes bucket k.  The whole
            # device section runs on the guarded owner thread; ANY device
            # failure (stall, PJRT/XLA error, compile failure) leaves these
            # thunks None and the lazy host executor below picks them up
            # (identical output, the err_flag pattern).
            from ..utils.device_guard import device_call

            def _device_block():
                stage1 = []
                for sz, idxs in sorted(by_bucket.items()):
                    if self.splice:
                        c1 = KP.exts2_batch_async(
                            [jobs[i] for i in idxs], self.mat, self.opt.q,
                            self.opt.e, self.opt.q2, self.opt.noncan,
                            interpret=self.interpret, quantize=True,
                            backtrack=bt)
                    else:
                        c1 = KP.extd2_batch_async(
                            [jobs[i] for i in idxs], self.mat, self.opt.q,
                            self.opt.e, self.opt.q2, self.opt.e2,
                            interpret=self.interpret, quantize=True,
                            backtrack=bt)
                    stage1.append((idxs, c1))
                stage2 = [(idxs, c1()) for idxs, c1 in stage1]
                out = []
                for idxs, c2 in stage2:
                    out.append((idxs, c2()))
                return out
            # cold bucket shapes get the compile budget (the same warm/cold
            # split device_flow uses): a first-compile on the tunnel link
            # can take minutes, and timing it out would ban the device
            keys = frozenset(by_bucket)
            tmo = None if self.interpret else (
                self.timeout if keys <= self._warm else max(
                    self._compile_timeout(), self.timeout))
            try:
                done = device_call(_device_block, tmo)
            except Exception:
                done = []
                with self._stat_lock:   # observable: silent fallback count
                    self.n_dev_errors = getattr(self, "n_dev_errors", 0) + 1
            else:
                self._warm |= keys       # warm only after a full success
            for idxs, res in done:
                for i, ez in zip(idxs, res):
                    thunks[i] = (lambda v=ez: v)
                with self._stat_lock:
                    self.n_device += len(idxs)
        n_host = 0
        for i, j in enumerate(jobs):
            if thunks[i] is None:
                thunks[i] = _host_thunk(self.opt, self.mat, j)
                n_host += 1
        if n_host:
            with self._stat_lock:
                self.n_host += n_host
        return thunks

    @staticmethod
    def _compile_timeout():
        from ..utils.device_guard import COMPILE_TIMEOUT_S
        return COMPILE_TIMEOUT_S


def run_scheduler(gens: list, executor) -> list:
    """Drive many wave-yielding generators to completion, executing the
    union of their current waves in one executor call per round.
    Returns each generator's StopIteration value, in order."""
    results = [None] * len(gens)
    live: dict[int, tuple] = {}
    for idx, g in enumerate(gens):
        try:
            live[idx] = (g, next(g))
        except StopIteration as e:
            results[idx] = e.value
    while live:
        all_jobs: list = []
        spans: dict[int, tuple[int, int]] = {}
        for idx, (g, wave) in live.items():
            spans[idx] = (len(all_jobs), len(wave))
            all_jobs.extend(wave)
        thunks = executor.run(all_jobs)
        nxt: dict[int, tuple] = {}
        for idx, (g, wave) in live.items():
            off, ln = spans[idx]
            try:
                nxt[idx] = (g, g.send(thunks[off:off + ln]))
            except StopIteration as e:
                results[idx] = e.value
        live = nxt
    return results
