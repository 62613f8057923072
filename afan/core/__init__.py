"""The A-FAN core algorithm, implemented once for all task stacks.

The reference forks this logic three times (``Classification/attack_algo.py``,
``Detection/attack_algo.py``, ``Segmentation/attack_algo.py``); here it is a
single set of pure functions shared by every trainer.
"""
from .attack import pgd, input_pgd, uniform_init, perturbation_norms
from .afn import mix_feature, mix_spectrum
from .spectrum import sample_points, sample_points_list, spectrum_weights
from .project import tensor_clamp, linfball_proj, l2ball_proj

__all__ = [
    "pgd", "input_pgd", "uniform_init", "perturbation_norms",
    "mix_feature", "mix_spectrum",
    "sample_points", "sample_points_list", "spectrum_weights",
    "tensor_clamp", "linfball_proj", "l2ball_proj",
]
