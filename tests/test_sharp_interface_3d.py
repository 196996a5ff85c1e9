"""3D sharp-interface machinery: marching tetrahedra, solid-angle phase
classification, icosphere surface meshes with discrete mean curvature, and
the dim-templated front-tracking / sharp-level-set solvers
(sharp_interface.h:503-1074, sharp_interface_util.h:833)."""

import io

import numpy as np
import pytest


def test_marching_tetrahedra_sphere():
    from adaflo_tpu.utils.point_eval import marching_tetrahedra_cells

    n = 32
    x = np.linspace(-0.6, 0.6, n + 1)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    V = np.sqrt(X**2 + Y**2 + Z**2) - 0.4

    def corners(A):
        return np.stack(
            [
                A[:-1, :-1, :-1], A[1:, :-1, :-1], A[:-1, 1:, :-1],
                A[1:, 1:, :-1], A[:-1, :-1, 1:], A[1:, :-1, 1:],
                A[:-1, 1:, 1:], A[1:, 1:, 1:],
            ],
            axis=-1,
        ).reshape(-1, 8)

    cv = corners(V)
    cc = np.stack([corners(X), corners(Y), corners(Z)], axis=-1)
    tris = marching_tetrahedra_cells(cv, cc)
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()
    assert abs(area - 4 * np.pi * 0.4**2) < 0.01
    r = np.linalg.norm(tris.reshape(-1, 3), axis=1)
    assert r.min() > 0.39 and r.max() < 0.401
    # consistent orientation: normals point outward (toward positive phi)
    nrm = np.cross(e1, e2)
    cent = tris.mean(axis=1)
    assert (np.einsum("td,td->t", nrm, cent) > 0).all()


def test_solid_angle_inside():
    from adaflo_tpu.twophase.sharp_interface import TriSurfaceMesh
    from adaflo_tpu.utils.point_eval import solid_angle_inside

    ts = TriSurfaceMesh.hyper_sphere(np.array([0.0, 0.0, 0.0]), 0.4, 2)
    pts = np.array(
        [[0, 0, 0], [0.39, 0, 0], [0.5, 0, 0], [0, 0, 0.45], [0.2, 0.2, 0.2]]
    )
    got = solid_angle_inside(ts.points, ts.triangles, pts)
    assert list(got) == [True, True, False, False, True]


def test_icosphere_curvature():
    from adaflo_tpu.twophase.sharp_interface import TriSurfaceMesh

    ts = TriSurfaceMesh.hyper_sphere(np.array([0.5, 0.5, 0.5]), 0.25, 3)
    c, n, a, k = ts.triangle_data()
    assert abs(a.sum() - 4 * np.pi * 0.25**2) < 0.01
    # outward normals; kappa = -2/R (matching the 2D -1/R convention)
    assert (np.einsum("td,td->t", n, c - 0.5) > 0).all()
    assert abs(k.mean() + 8.0) < 0.05


@pytest.mark.parametrize("method", ["front tracking", "sharp level set"])
def test_sim_rising_bubble_3d_step(method):
    from adaflo_tpu.drivers.rising_bubble import TwoPhaseParameters
    from adaflo_tpu.drivers.sim_rising_bubble import MicroFluidicProblem

    par = TwoPhaseParameters.from_file("tests/prms/sim_rising_bubble_short.prm")
    par.dimension = 3
    par.global_refinements = 0
    par.end_time = 0.02
    par.solver_method = method
    prob = MicroFluidicProblem(par, out=io.StringIO())
    prob.run()
    u = np.asarray(prob.navier_stokes.solution[0])
    assert np.isfinite(u).all()
    # buoyancy starts the rise: vertical (z) velocity dominates
    assert np.abs(u[2]).max() > 1e-3
    assert np.abs(u[2]).max() >= 0.5 * np.abs(u[:2]).max()
