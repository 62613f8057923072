"""A-FAN TPU: a TPU-native (JAX/Flax/XLA/Pallas) framework for adversarial
feature augmentation and normalization, with the capabilities of the
reference CV_A-FAN (VITA-Group/CV_A-FAN): CIFAR classification, Faster R-CNN
detection, and DeepLabv3/v3+ segmentation — all trained with feature-level
PGD ("ALFA"), spectrum augmentation ("SAT"), and adversarial feature
normalization ("AFN").

Unlike the reference (three forked PyTorch stacks that share no code), the
core algorithm here lives once in :mod:`afan.core` as pure, jit-compatible
functions; models expose static tap points (:mod:`afan.models.taps`), and the
entire adversarial train step — clean head forward, `lax.scan` PGD ascent,
spectrum tails, combined loss, optimizer update — compiles into a single XLA
program per tap configuration.
"""

__version__ = "0.1.0"

import os as _os

# AFAN_PLATFORM=cpu|tpu: pick the JAX backend for CLI subprocesses. A
# plain JAX_PLATFORMS env var is NOT enough on hosts whose sitecustomize
# pre-imports jax with a baked platform; config.update after import works.
_plat = _os.environ.get("AFAN_PLATFORM")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)
    del _jax
del _os, _plat

# Persistent XLA compilation cache: identical programs reload in seconds
# across processes instead of paying 10-25 min recompiles (1-core host,
# remote TPU compile). Opt out with AFAN_NO_COMPILE_CACHE=1.
from .utils.compilation_cache import enable_persistent_cache as _epc

_epc()
del _epc
