"""Determinism helpers (reference utils/data_utils.py:945-952).

JAX randomness is already explicit (threaded PRNGKeys); this seeds the
host-side libraries used by the data pipeline.
"""

import random

import numpy as np


def set_random_seeds(seed: int = 0):
    np.random.seed(seed)
    random.seed(seed)
    try:
        import cv2

        cv2.setRNGSeed(seed)
    except ImportError:
        pass
