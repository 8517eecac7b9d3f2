"""Parity against the REFERENCE'S OWN importable code (not replicas).

The reference at /root/reference is torch/numpy; its pure modules import
fine here with four trivial third-party stubs (mmcv/numba/png/chardet are
only used for vis/IO helpers we never call). These tests use them as
oracles:

  * lib/pysixd/pose_error.py   — add/adi/re/te/proj/mssd/mspd
  * lib/pysixd/pose_matching.py — match_poses (the BOP matching rule)
  * lib/torch_utils/solver/ranger.py, AdaBelief.py, madgrad.py, adamp.py,
    sgdp.py, sgd_gc.py          — optimizer trajectories on a toy problem
  * lib/torch_utils/solver/lr_scheduler.py — flat_and_anneal factor curve
  * core/utils/lie_algebra.py  — so(3) exp/log

Modules that CANNOT import here (documented, replicas remain the oracle
for those): anything under core/gdrn_modeling/models (needs mmcv.cnn +
timm), core/utils/data_utils (py3.12 collections.Sequence), pose_utils
(numba jit classes), rot_reps (transforms3d).
"""

import sys
import types

import numpy as np
import pytest
import jax
import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import reference modules with minimal stubs for vis/IO-only deps."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    def _identity_dec(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f

    stub("mmcv", color_val=lambda c: (0, 255, 0), load=lambda *a, **k: {})
    stub("numba", jit=_identity_dec, njit=_identity_dec)
    stub("png")
    stub("chardet", detect=lambda b: {"encoding": "utf-8"})

    import importlib
    ns = types.SimpleNamespace()
    ns.pose_error = importlib.import_module("lib.pysixd.pose_error")
    ns.pose_matching = importlib.import_module("lib.pysixd.pose_matching")
    ns.ranger = importlib.import_module("lib.torch_utils.solver.ranger")
    ns.adabelief = importlib.import_module("lib.torch_utils.solver.AdaBelief")
    ns.madgrad = importlib.import_module("lib.torch_utils.solver.madgrad")
    ns.adamp = importlib.import_module("lib.torch_utils.solver.adamp")
    ns.sgdp = importlib.import_module("lib.torch_utils.solver.sgdp")
    ns.sgd_gc = importlib.import_module("lib.torch_utils.solver.sgd_gc")
    ns.lr_scheduler = importlib.import_module(
        "lib.torch_utils.solver.lr_scheduler")
    ns.lie = importlib.import_module("core.utils.lie_algebra")
    return ns


def _rand_rots(rs, n):
    q = rs.randn(n, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# pose errors
# ---------------------------------------------------------------------------

def test_pose_errors_vs_reference(ref):
    from gdrnpp_bop2022_tpu.eval.pose_error import (
        add_batch, adi_batch, re_batch, te_batch, proj_batch,
        mssd_batch, mspd_batch)

    rs = np.random.RandomState(0)
    N = 16
    Re = _rand_rots(rs, N)
    Rg = _rand_rots(rs, N)
    te_ = rs.uniform(-0.1, 0.1, (N, 3)).astype(np.float32)
    te_[:, 2] += 0.8
    tg = te_ + rs.uniform(-0.02, 0.02, (N, 3)).astype(np.float32)
    pts = rs.uniform(-0.05, 0.05, (200, 3)).astype(np.float32)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)

    # non-trivial symmetry set with a translation (off-center axis)
    ang = 2 * np.pi / 3
    c, s = np.cos(ang), np.sin(ang)
    sym_R = np.stack([np.eye(3, dtype=np.float32),
                      np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32),
                      np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], np.float32)])
    sym_t = np.array([[0, 0, 0], [0.01, -0.005, 0.002],
                      [-0.01, 0.005, -0.002]], np.float32)
    syms = [{"R": R_, "t": t_.reshape(3, 1)} for R_, t_ in zip(sym_R, sym_t)]

    P = jnp.asarray(np.tile(pts[None], (N, 1, 1)))
    sR = jnp.asarray(np.tile(sym_R[None], (N, 1, 1, 1)))
    st = jnp.asarray(np.tile(sym_t[None], (N, 1, 1)))
    sv = jnp.ones((N, 3), bool)
    Kb = jnp.asarray(np.tile(K[None], (N, 1, 1)))

    mine = {
        "add": np.asarray(add_batch(Re, te_, Rg, tg, P)),
        "adi": np.asarray(adi_batch(Re, te_, Rg, tg, P)),
        "re": np.asarray(re_batch(Re, Rg)),
        "te": np.asarray(te_batch(te_, tg)),
        "proj": np.asarray(proj_batch(Re, te_, Rg, tg, Kb, P)),
        "mssd": np.asarray(mssd_batch(Re, te_, Rg, tg, P, sR, st, sv)),
        "mspd": np.asarray(mspd_batch(Re, te_, Rg, tg, Kb, P, sR, st, sv)),
    }
    pe = ref.pose_error
    for i in range(N):
        t_e = te_[i].reshape(3, 1)
        t_g = tg[i].reshape(3, 1)
        np.testing.assert_allclose(
            mine["add"][i], pe.add(Re[i], t_e, Rg[i], t_g, pts),
            rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(
            mine["adi"][i], pe.adi(Re[i], t_e, Rg[i], t_g, pts),
            rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(
            mine["re"][i], pe.re(Re[i], Rg[i]), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(
            mine["te"][i], pe.te(t_e, t_g), rtol=1e-4, atol=1e-8)
        np.testing.assert_allclose(
            mine["proj"][i], pe.proj(Re[i], t_e, Rg[i], t_g, K, pts),
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            mine["mssd"][i], pe.mssd(Re[i], t_e, Rg[i], t_g, pts, syms),
            rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            mine["mspd"][i], pe.mspd(Re[i], t_e, Rg[i], t_g, K, pts, syms),
            rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# BOP matching
# ---------------------------------------------------------------------------

def test_match_count_vs_reference_match_poses(ref):
    from gdrnpp_bop2022_tpu.eval.scorer import match_count

    rs = np.random.RandomState(1)
    for trial in range(30):
        ne = rs.randint(1, 6)
        ng = rs.randint(1, 6)
        table = rs.uniform(0, 1, (ne, ng))
        if trial % 3 == 0:   # exercise exact-threshold ties
            table[rs.randint(ne), rs.randint(ng)] = 0.5
        # scorer rows are sorted by decreasing score already
        scores = np.sort(rs.uniform(0, 1, ne))[::-1]
        errs = [{"est_id": i, "score": float(scores[i]),
                 "errors": {j: [float(table[i, j])] for j in range(ng)}}
                for i in range(ne)]
        for th in (0.1, 0.3, 0.5, 0.9):
            expect = len(ref.pose_matching.match_poses(errs, [th]))
            got = match_count(table, th)
            assert got == expect, (trial, th, table)


def test_scorer_vs_reference_matching_end_to_end(ref):
    """Full score_bop_results mssd recall vs a from-scratch recall computed
    with the reference's own mssd + match_poses."""
    from gdrnpp_bop2022_tpu.eval.scorer import (
        MSSD_THS, score_bop_results)

    rs = np.random.RandomState(2)
    pts = rs.uniform(-0.03, 0.03, (128, 3)).astype(np.float32)

    class Bank:
        obj_ids = [1]
        points = pts[None]
        diameters = np.array([0.1], np.float32)
        sym_rotations = [None]
        sym_translations = [None]
        verts = pts[None]
        faces = np.zeros((1, 1, 3), np.int64)

    results, gts = [], []
    for im in range(6):
        for inst in range(rs.randint(1, 3)):
            Rg = _rand_rots(rs, 1)[0]
            tg = np.array([0, 0, 0.6 + 0.1 * inst], np.float32)
            gts.append({"scene_id": 1, "im_id": im, "obj_id": 1,
                        "R": Rg, "t": tg, "visib_fract": 1.0})
            Re = _rand_rots(rs, 1)[0] if rs.uniform() < 0.4 else Rg
            dt = rs.uniform(0, 0.02, 3).astype(np.float32)
            results.append({"scene_id": 1, "im_id": im, "obj_id": 1,
                            "score": float(rs.uniform(0.5, 1)),
                            "R": Re, "t": tg + dt})

    got = score_bop_results(results, gts, Bank(), errors=("mssd",))

    # oracle recall from the reference's own primitives
    from collections import defaultdict
    est_g, gt_g = defaultdict(list), defaultdict(list)
    for r in results:
        est_g[(r["scene_id"], r["im_id"])].append(r)
    for g in gts:
        gt_g[(g["scene_id"], g["im_id"])].append(g)
    syms = [{"R": np.eye(3), "t": np.zeros((3, 1))}]
    n_gt_total = len(gts)
    recalls = []
    for th in MSSD_THS:
        n_match = 0
        for key, gt_list in gt_g.items():
            ests = sorted(est_g[key], key=lambda e: -e["score"])[:len(gt_list)]
            errs = []
            for i, e in enumerate(ests):
                errors = {j: [ref.pose_error.mssd(
                    e["R"], e["t"].reshape(3, 1), g["R"],
                    g["t"].reshape(3, 1), pts, syms)]
                    for j, g in enumerate(gt_list)}
                errs.append({"est_id": i, "score": e["score"],
                             "errors": errors})
            n_match += len(ref.pose_matching.match_poses(
                errs, [th * 0.1]))   # th * diameter
        recalls.append(n_match / n_gt_total)
    np.testing.assert_allclose(got["AR_mssd"], np.mean(recalls), atol=1e-6)


# ---------------------------------------------------------------------------
# optimizers: trajectory equality on a toy problem
# ---------------------------------------------------------------------------

def _torch_trajectory(make_opt, n_steps, shapes, seed=3):
    import torch
    torch.manual_seed(0)
    rs = np.random.RandomState(seed)
    params = [torch.tensor(rs.randn(*s).astype(np.float32),
                           requires_grad=True) for s in shapes]
    tgt = [torch.tensor(rs.randn(*s).astype(np.float32)) for s in shapes]
    opt = make_opt(params)
    traj = []
    for _ in range(n_steps):
        opt.zero_grad()
        loss = sum(((p - t) ** 2).sum() + 0.3 * (p ** 3).sum()
                   for p, t in zip(params, tgt))
        loss.backward()
        opt.step()
        traj.append([p.detach().numpy().copy() for p in params])
    return traj


def _jax_trajectory(tx, n_steps, shapes, seed=3):
    import optax
    rs = np.random.RandomState(seed)
    params = [jnp.asarray(rs.randn(*s).astype(np.float32)) for s in shapes]
    tgt = [jnp.asarray(rs.randn(*s).astype(np.float32)) for s in shapes]

    def loss_fn(ps):
        return sum(((p - t) ** 2).sum() + 0.3 * (p ** 3).sum()
                   for p, t in zip(ps, tgt))

    state = tx.init(params)
    traj = []
    for _ in range(n_steps):
        g = jax.grad(loss_fn)(params)
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
        traj.append([np.asarray(p) for p in params])
    return traj


def _assert_traj_close(a, b, atol):
    assert len(a) == len(b)
    for sa, sb in zip(a, b):
        for pa, pb in zip(sa, sb):
            np.testing.assert_allclose(pa, pb, atol=atol, rtol=1e-4)


SHAPES = [(4, 6), (5,)]
N_STEPS = 25


def test_ranger_vs_reference(ref):
    from gdrnpp_bop2022_tpu.solver.ranger import ranger
    ref_traj = _torch_trajectory(
        lambda ps: ref.ranger.Ranger(ps, lr=1e-2, alpha=0.5, k=6,
                                     betas=(0.95, 0.999), eps=1e-5,
                                     weight_decay=0.0),
        N_STEPS, SHAPES)
    my_traj = _jax_trajectory(
        ranger(1e-2, alpha=0.5, k=6, b1=0.95, b2=0.999, eps=1e-5),
        N_STEPS, SHAPES)
    _assert_traj_close(ref_traj, my_traj, atol=2e-5)


def test_adabelief_vs_reference(ref):
    from gdrnpp_bop2022_tpu.solver.optimizers import adabelief
    ref_traj = _torch_trajectory(
        lambda ps: ref.adabelief.AdaBelief(ps, lr=1e-2, betas=(0.9, 0.999),
                                           eps=1e-16, weight_decay=0.0),
        N_STEPS, SHAPES)
    my_traj = _jax_trajectory(adabelief(1e-2, eps=1e-16), N_STEPS, SHAPES)
    _assert_traj_close(ref_traj, my_traj, atol=2e-5)


def test_madgrad_vs_reference(ref):
    from gdrnpp_bop2022_tpu.solver.optimizers import madgrad
    ref_traj = _torch_trajectory(
        lambda ps: ref.madgrad.MADGRAD(ps, lr=1e-2, momentum=0.9,
                                       weight_decay=0.0, eps=1e-6),
        N_STEPS, SHAPES)
    my_traj = _jax_trajectory(madgrad(1e-2, momentum=0.9, eps=1e-6),
                              N_STEPS, SHAPES)
    _assert_traj_close(ref_traj, my_traj, atol=2e-5)


def test_sgd_gc_vs_reference(ref):
    from gdrnpp_bop2022_tpu.solver.optimizers import sgd_gc
    ref_traj = _torch_trajectory(
        lambda ps: ref.sgd_gc.SGD_GC(ps, lr=1e-2, momentum=0.9),
        N_STEPS, SHAPES)
    my_traj = _jax_trajectory(sgd_gc(1e-2, momentum=0.9), N_STEPS, SHAPES)
    _assert_traj_close(ref_traj, my_traj, atol=2e-5)


def test_adamp_sgdp_vs_reference_1d(ref):
    """1-D params: neither side applies the channel projection (reference
    adamp.py `len(p.shape) > 1` gate), so trajectories must agree exactly.
    (For >=2-D the projection grouping is layout-transposed by design:
    torch groups (C_out, rest), flax kernels group by the LAST axis.)"""
    from gdrnpp_bop2022_tpu.solver.optimizers import adamp, sgdp
    shapes = [(7,), (3,)]
    ref_traj = _torch_trajectory(
        lambda ps: ref.adamp.AdamP(ps, lr=1e-2, betas=(0.9, 0.999), eps=1e-8),
        N_STEPS, shapes)
    my_traj = _jax_trajectory(adamp(1e-2), N_STEPS, shapes)
    _assert_traj_close(ref_traj, my_traj, atol=2e-5)

    ref_traj = _torch_trajectory(
        lambda ps: ref.sgdp.SGDP(ps, lr=1e-2, momentum=0.9),
        N_STEPS, shapes)
    my_traj = _jax_trajectory(sgdp(1e-2, momentum=0.9), N_STEPS, shapes)
    _assert_traj_close(ref_traj, my_traj, atol=2e-5)


# ---------------------------------------------------------------------------
# lr schedule
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("warmup_method,anneal_method", [
    ("linear", "cosine"), ("pow", "linear"), ("exp", "poly"),
    ("constant", "none"), ("linear", "exp"),
])
def test_flat_and_anneal_vs_reference(ref, warmup_method, anneal_method):
    import torch
    from gdrnpp_bop2022_tpu.solver.lr_scheduler import flat_and_anneal_schedule

    total, warm = 200, 20
    kw = dict(total_iters=total, warmup_iters=warm, warmup_factor=0.1,
              warmup_method=warmup_method, warmup_pow=2.0,
              anneal_point=0.6, anneal_method=anneal_method,
              target_lr_factor=0.05 if anneal_method == "exp" else 0.0,
              poly_power=1.5)
    dummy = torch.optim.SGD([torch.zeros(1, requires_grad=True)], lr=1.0)
    _, f = ref.lr_scheduler.flat_and_anneal_lr_scheduler(
        dummy, return_function=True, **kw)
    mine = flat_and_anneal_schedule(base_lr=1.0, **kw)
    for step in range(0, total, 3):
        np.testing.assert_allclose(float(mine(step)), f(step),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"step {step}")


# ---------------------------------------------------------------------------
# lie algebra
# ---------------------------------------------------------------------------

def test_lie_vec_roundtrip_vs_reference(ref):
    import torch
    from gdrnpp_bop2022_tpu.geometry.rotations import (
        lie_vec_to_rot, rot_to_lie_vec)

    rs = np.random.RandomState(4)
    vecs = rs.uniform(-1.5, 1.5, (12, 3)).astype(np.float32)
    mine_R = np.asarray(lie_vec_to_rot(jnp.asarray(vecs)))
    ref_R = ref.lie.lie_vec_to_rot(torch.tensor(vecs)).numpy()
    np.testing.assert_allclose(mine_R, ref_R, atol=1e-5)

    Rs = _rand_rots(rs, 12)
    mine_v = np.asarray(rot_to_lie_vec(jnp.asarray(Rs)))
    ref_v = ref.lie.rot_to_lie_vec(torch.tensor(Rs)).numpy()
    np.testing.assert_allclose(mine_v, ref_v, atol=1e-4)
