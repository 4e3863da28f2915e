"""Shared test fixtures: the numerical-property matrix family of the
reference test-suite (test/test_utils.py:14-99) -- six 10x10 operators
spanning SPD / HPD / symmetric-indefinite / hermitian-indefinite /
nonsymmetric / complex-nonsymmetric, three inner-product forms, operator
and vector shape dualities."""

import numpy
import jax.numpy as jnp

import krypy_tpu  # noqa: F401 -- import enables x64 policy
from krypy_tpu import utils


def matrix_spd():
    a = numpy.linspace(1, 2, 10)
    a[-1] = 1e-2
    return numpy.diag(a)


def matrix_hpd():
    a = numpy.linspace(1, 2, 10).astype(complex)
    a[0] = 5
    a[-1] = 1e-1
    A = numpy.diag(a)
    A[-1, 0] = 1e-1j
    A[0, -1] = -1e-1j
    return A


def matrix_symm_indef():
    a = numpy.linspace(1, 2, 10)
    a[-1] = -1
    return numpy.diag(a)


def matrix_herm_indef():
    a = numpy.linspace(1, 2, 10).astype(complex)
    a[-1] = 1e-3
    A = numpy.diag(a)
    A[-1, 0] = 10j
    A[0, -1] = -10j
    return A


def matrix_nonsymm():
    a = numpy.arange(1, 11).astype(float)
    a[-1] = -1e1
    A = numpy.diag(a)
    A[0, -1] = 1e1
    return A


def matrix_comp_nonsymm():
    a = numpy.arange(1, 11).astype(complex)
    a[-1] = -1e1
    A = numpy.diag(a)
    A[0, -1] = 1.0e1j
    return A


def get_matrices(
    spd=True,
    hpd=True,
    symm_indef=True,
    herm_indef=True,
    nonsymm=True,
    comp_nonsymm=True,
):
    out = []
    if spd:
        out.append(matrix_spd())
    if hpd:
        out.append(matrix_hpd())
    if symm_indef:
        out.append(matrix_symm_indef())
    if herm_indef:
        out.append(matrix_herm_indef())
    if nonsymm:
        out.append(matrix_nonsymm())
    if comp_nonsymm:
        out.append(matrix_comp_nonsymm())
    return out


_B = numpy.diag(numpy.linspace(1, 5, 10))


def get_ip_Bs():
    B = _B
    return [
        None,
        utils.MatrixLinearOperator(B),
        lambda x, y: jnp.dot(x.conj().T, jnp.dot(jnp.asarray(B), y)),
    ]


def get_operators(A):
    return [A, utils.MatrixLinearOperator(A)]


def get_vecs(v):
    return [v, numpy.reshape(v, (v.shape[0],))]
