"""numpy/jax array-library dispatch — rebuild of reference
core/utils/lib_handling.py:9-30 (there: numpy/torch polymorphism for the
metrics code). Most of this package is either pure host numpy or pure jnp,
so this shim mainly serves API parity for downstream users.
"""
from __future__ import annotations

from functools import partial
from typing import Union

import jax
import jax.numpy as jnp
import numpy


def get_lib(data_object: Union[numpy.ndarray, jax.Array]):
    """Return the array module (numpy or jax.numpy) matching the input."""
    if isinstance(data_object, numpy.ndarray):
        return numpy
    if isinstance(data_object, jax.Array):
        return jnp
    raise TypeError("%s is not supported" % type(data_object))


def get_class(data_object: Union[numpy.ndarray, jax.Array]):
    """Return an array constructor matching the input's library/dtype."""
    if isinstance(data_object, numpy.ndarray):
        return numpy.array
    if isinstance(data_object, jax.Array):
        return partial(jnp.asarray, dtype=data_object.dtype)
    raise TypeError("%s is not supported" % type(data_object))
