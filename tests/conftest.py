"""Test fixtures. The CPU-mesh re-exec shim lives in the root conftest.py."""

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
