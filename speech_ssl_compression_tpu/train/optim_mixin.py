"""Optimizer + LR-schedule state shared by Runner and WaveRunner.

One implementation of the schedule-offset bookkeeping (prune-event resets,
resume re-sync, epoch-derived totals) — these five methods were previously
duplicated per runner and drifted.

Host attributes the mixin relies on: ``runner_config``, ``optimizer``,
``opt_state``, ``params``, ``_resumed_meta``, and the mutable
``_sched_offset`` / ``_sched_total`` pair (initialized by
:meth:`_init_optimizer_state`).
"""

from __future__ import annotations

import jax

from .steps import (
    applied_lr,
    make_apply_step,
    make_optimizer_from_config,
    optimizer_schedule,
)


class OptimizerScheduleMixin:
    def _init_optimizer_state(self):
        self._sched_offset = 0
        self._sched_total = None
        self.optimizer = self._build_optimizer()
        self.opt_state = self.optimizer.init(self.params)

    def _build_optimizer(self):
        return make_optimizer_from_config(
            self.runner_config, sched_offset=self._sched_offset,
            total_steps=self._sched_total,
        )

    def _resync_schedule_offset(self):
        """After restoring optimizer state from a checkpoint: the Adam
        count may be a post-prune-reset count while the checkpoint's
        ``Step`` is the global update count — rebuild the optimizer so the
        schedule stays on the global count across the resume (the
        in-memory offset from the original run does not survive)."""
        if optimizer_schedule(self.optimizer) is None:
            return
        count = int(jax.tree.leaves(self.opt_state)[0])
        step = int((self._resumed_meta or {}).get("Step", count) or count)
        if step > count:
            self._sched_offset = step - count
            self.optimizer = self._build_optimizer()

    def _finalize_schedule_total(self, total_steps: int):
        """Epoch-driven runs resolve their length only in train(): if the
        schedule was built without a total (needs_total), rebuild the
        optimizer so polynomial decay uses the real run length."""
        sched = optimizer_schedule(self.optimizer)
        if sched is None or not getattr(sched, "needs_total", False):
            return
        self._sched_total = int(total_steps)
        self.optimizer = self._build_optimizer()
        self.apply_step = make_apply_step(self.optimizer, donate=True)

    def _reset_optimizer(self, global_step: int = 0):
        """Fresh Adam state (the reference re-creates the torch optimizer
        after structured prune events, runner.py:348,356). With an lr
        schedule active, rebuild the optimizer with the schedule offset by
        the global step so the lr does NOT re-warm from zero after the
        reset (the count leaf restarts; prune events re-jit anyway)."""
        if optimizer_schedule(self.optimizer) is not None and global_step:
            self._sched_offset = int(global_step)
            self.optimizer = self._build_optimizer()
            self.apply_step = make_apply_step(self.optimizer, donate=True)
        self.opt_state = self.optimizer.init(self.params)

    def _applied_lr(self):
        return applied_lr(self.optimizer, self.opt_state)
