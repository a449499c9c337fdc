"""Learning-rate schedules.

The reference treats the LR schedule as config-as-code: any ``step -> float``
callable, re-evaluated every step (`/root/reference/fcn8s_tensorflow.py:438-439,
527,583`). That contract is preserved verbatim — the trainer calls
``schedule(global_step)`` on host and feeds the result as a traced scalar
(zero recompiles). Helpers below build the canonical schedules.
"""

from __future__ import annotations


def piecewise_constant(boundaries, values):
    """``values[i]`` while ``step < boundaries[i]``; ``values[-1]`` after.

    ``len(values) == len(boundaries) + 1``.
    """
    if len(values) != len(boundaries) + 1:
        raise ValueError("need len(values) == len(boundaries) + 1")

    def schedule(step: int) -> float:
        for boundary, value in zip(boundaries, values):
            if step < boundary:
                return value
        return values[-1]

    return schedule


def reference_tutorial_schedule():
    """The canonical schedule from the reference tutorial (cell 15):
    1e-4 (<=10k) -> 1e-5 (<=20k) -> 3e-6 (<=40k) -> 1e-6."""
    return piecewise_constant([10000, 20000, 40000], [1e-4, 1e-5, 3e-6, 1e-6])


def constant(lr: float):
    return lambda step: lr
