"""Learning-rate / noise schedules (parity with the reference).

Host-side scalar schedules: the reference assigns these into graph
variables between iterations (scripts/train_gan_rnn_placeholder.py:524-533);
here the scalars are simply passed into the jitted step each call, so no
recompilation happens when they change.
"""

from __future__ import annotations

import math


def exponential_decay(iteration: int, num_jobs: int, num_iters: int,
                      init_value: float, multiply_jobs: bool = True) -> float:
    """Exact port of utils/ops.py:378-391.

    Decays to 1e-4x the initial value over ``num_iters`` iterations
    (geometric interpolation); optionally scales by the replica count
    (the reference's LR x num_gpu rule).

    Deviation: ``init_value == 0`` returns 0 (the geometric decay of
    zero is zero at every step). The reference divides by the initial
    value unguarded (utils/ops.py:385) and raises ZeroDivisionError —
    which its GAN scripts only avoid because their recipes always pass
    a nonzero ``--init_disc_noise_std``; our unified CLI also runs this
    schedule for the MSE trainers, where 0.0 is the default.
    """
    if init_value == 0.0:
        return 0.0
    final_value = 0.0001 * init_value
    if iteration + 1 >= num_iters:
        current = final_value
    else:
        current = init_value * math.exp(
            iteration * math.log(final_value / init_value) / num_iters)
    if multiply_jobs:
        return num_jobs * current
    return current


def staged_decay(init_lr: float, decay_factor: float,
                 decay_steps: int) -> float:
    """Frame-trainer staged decay: lr * factor^steps, stepped whenever CV
    improvement drops below start_decay_impr (scripts/train_dnn.py:416-424).
    """
    return init_lr * decay_factor ** decay_steps


class ImprovementTracker:
    """Windowed relative-improvement accept/reject bookkeeping.

    Mirrors scripts/train_gan_rnn_placeholder.py:452-456,535-562: collect CV
    losses into a window; at each check interval compare the window mean to
    the best accepted mean; accept (and save) on improvement, never roll
    back; early-stop when relative improvement falls below ``end_improve``
    past ``min_iters``.
    """

    def __init__(self, end_improve: float = 0.001, check_interval: int = 1):
        self.loss_prev = 10000.0
        self.rel_impr = 1.0
        self.end_improve = end_improve
        self.check_interval = check_interval
        self.window = []

    def add(self, cv_loss: float) -> None:
        self.window.append(cv_loss)

    def check(self, iteration: int):
        """Returns (should_save, should_stop_component). Call after add()."""
        should_save = False
        if (iteration + 1) % self.check_interval == 0 and self.window:
            loss_new = sum(self.window) / len(self.window)
            self.rel_impr = (self.loss_prev - loss_new) / self.loss_prev
            if self.rel_impr > 0.0:
                should_save = True
                self.loss_prev = loss_new
            self.window = []
        return should_save

    def should_stop(self, iteration: int, min_iters: int) -> bool:
        return (iteration + 1 > min_iters
                and (iteration + 1) % self.check_interval == 0
                and self.rel_impr < self.end_improve)
