"""Profiling/observability utilities.

The reference hand-rolls AverageMeter + per-stage perf_counter meters
(models.py:1414-1430, 81-86; SURVEY.md §5 'Tracing'). We keep the same
meters for apples-to-apples fps reporting and add a jax.profiler trace
context for xprof."""

from __future__ import annotations

import contextlib
import time

import jax


class AverageMeter:
    """Running average (reference models.py:1414-1430)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class StageTimers:
    """Named wall-clock stage meters (the reference's E-FL/E-MV/... set,
    models.py:81-86). Use `with timers.stage('E-MV'): ...`; device work is
    block_until_ready'd so timings are honest."""

    STAGES = (
        "E-FL", "E-MV", "eEMV", "E-MC", "E-RES", "eERES", "E-NET",
        "D-MV", "eDMV", "D-MC", "D-RES", "eDRES", "D-NET",
    )

    def __init__(self):
        self.meters = {s: AverageMeter() for s in self.STAGES}

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        if name not in self.meters:
            self.meters[name] = AverageMeter()
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            jax.block_until_ready(sync_value)
        self.meters[name].update(time.perf_counter() - t0)

    @property
    def encoding_time(self) -> float:
        return sum(
            self.meters[s].avg
            for s in ("E-FL", "E-MV", "E-MC", "E-RES", "D-MV", "D-MC", "D-RES")
        )

    @property
    def decoding_time(self) -> float:
        return sum(self.meters[s].avg for s in ("D-MV", "D-MC", "D-RES"))


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """jax.profiler trace for xprof/TensorBoard inspection."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
