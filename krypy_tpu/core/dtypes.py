"""dtype and shape helpers (reference: krypy/utils.py:106-143)."""

import jax.numpy as jnp
import numpy as np

__all__ = ["find_common_dtype", "shape_vec", "shape_vecs", "asarray"]


def asarray(x):
    """Coerce input to a jnp array (device array); None passes through."""
    if x is None:
        return None
    return jnp.asarray(x)


def find_common_dtype(*args):
    """Common dtype of arrays / operators / dtypes; ignores None and objects
    without a dtype (reference: krypy/utils.py:106-122)."""
    dtypes = []
    for arg in args:
        if arg is None:
            continue
        dt = getattr(arg, "dtype", None)
        if dt is not None:
            dtypes.append(np.dtype(dt))
        elif isinstance(arg, (np.dtype, str, type)):
            try:
                dtypes.append(np.dtype(arg))
            except TypeError:
                pass
    if not dtypes:
        return np.dtype(jnp.zeros(0).dtype)
    out = dtypes[0]
    for dt in dtypes[1:]:
        out = np.promote_types(out, dt)
    return out


def shape_vec(x):
    """Reshape a ``(n,)`` vector into a ``(n, 1)`` column
    (reference: krypy/utils.py:125-127)."""
    return jnp.reshape(x, (x.shape[0], 1))


def shape_vecs(*args):
    """Bring all array arguments into column shape ``(n, 1)``.

    Returns ``(flat_vecs, args)`` where ``flat_vecs`` is True iff every array
    argument came in flat ``(n,)`` form -- solvers use this to return results
    in the caller's shape convention (reference: krypy/utils.py:130-143).
    """
    out = []
    flat_vecs = True
    for arg in args:
        if arg is not None and hasattr(arg, "shape") and hasattr(arg, "ndim"):
            arg = jnp.asarray(arg)
            if arg.ndim == 1:
                arg = shape_vec(arg)
            else:
                flat_vecs = False
        out.append(arg)
    return flat_vecs, out
