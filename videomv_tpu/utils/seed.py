"""Deterministic seeding (reference utils/seed.py:5-10).

JAX randomness is already explicit (threaded PRNG keys); this seeds the
host-side numpy/python RNGs used by data pipelines.
"""

import os
import random

import numpy as np


def setup_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
