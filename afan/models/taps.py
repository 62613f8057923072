"""Tap-point abstraction: a model is a static sequence of stages.

The reference exposes intermediate "tap points" three different ways —
slicing an ``nn.Sequential`` (`Classification/resnet_s.py:119-121`),
dict-dispatch on ``input_dict['flag']/['out_idx']``
(`Detection/model.py:40-185`), and a dict-forward segmentation wrapper
(`Segmentation/network/utils.py:14-47`). All of them reduce to one idea:
*run stages [0, k) to get the tapped feature ("head"), then stages [k, N)
from a (possibly adversarial) feature ("tail")*.

Here that idea is first-class: a :class:`StagedModule` declares an ordered
stage list; ``head``/``tail``/full forwards are static python slices, so
each tap configuration traces into its own fused XLA program — no runtime
flag dispatch, no dynamic control flow inside jit.
"""
from __future__ import annotations

from typing import Any, Callable, List, Optional

import flax.linen as nn

# A stage is a callable (x, train) -> x. BN-bearing stages honor `train`.
Stage = Callable[[Any, bool], Any]


class StagedModule(nn.Module):
    """Base class for models exposing head/tail split forwards.

    Subclasses define submodules in ``setup()`` and implement
    :meth:`stages` returning the ordered stage list. ``start``/``end`` must
    be static python ints (they select which stages are traced).
    """

    def stages(self) -> List[Stage]:  # pragma: no cover - abstract
        raise NotImplementedError

    @property
    def num_stages(self) -> int:
        return len(self.stages())

    def __call__(self, x, start: int = 0, end: Optional[int] = None,
                 train: bool = False):
        """Run stages ``[start, end)`` — the reference's
        ``forward(x, end_point, start_point)`` (`resnet_s.py:119-121`)."""
        stage_list = self.stages()
        if end is None:
            end = len(stage_list)
        for stage in stage_list[start:end]:
            x = stage(x, train)
        return x

    # Readability aliases used by the trainers.
    def head(self, x, tap: int, train: bool = False):
        """Input → tapped feature (stages [0, tap))."""
        return self(x, start=0, end=tap, train=train)

    def tail(self, feature, tap: int, train: bool = False):
        """(Possibly adversarial) tapped feature → output (stages [tap, N))."""
        return self(feature, start=tap, end=None, train=train)

    def multi_head(self, x, taps, train: bool = False):
        """ONE forward collecting the tapped features at several tap
        points — stages [0, max(taps)) run exactly once. Functionally
        identical to ``[self.head(x, t) for t in taps]`` (which re-runs
        the shared prefix per tap: ~4x redundant stage work for the
        9-tap learnable-eta trainer, `Classification/main_learnable.py:59`).
        ``taps`` must be static python ints. Returns features in ``taps``
        order (duplicates allowed)."""
        stage_list = self.stages()
        taps = tuple(int(t) for t in taps)
        if not taps:
            raise ValueError("multi_head requires at least one tap point")
        for t in taps:
            check_tap(t, len(stage_list))
        tap_set = set(taps)
        last = max(taps)
        feats = {}
        for i in range(last):
            if i in tap_set:
                feats[i] = x
            x = stage_list[i](x, train)
        feats[last] = x
        return [feats[t] for t in taps]


def check_tap(tap: int, num_stages: int) -> None:
    if not (0 <= tap <= num_stages):
        raise ValueError(f"tap point {tap} out of range [0, {num_stages}]")
