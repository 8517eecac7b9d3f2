"""YOLOX torch->flax checkpoint parity (BatchNorm path).

Builds a reference-named random YOLOX-s state dict (reference param tree:
det/yolox/models — backbone.backbone.* CSPDarknet, backbone.* PAFPN laterals
/CSP fusions, head.*), runs the reference forward functionally in torch
(BaseConv = conv+BN(eval)+SiLU), converts with convert_yolox_checkpoint,
and requires the flax YOLOX(norm="BN") forward to match to 1e-3.

This is what makes the released YOLOX-X test_bboxes reproducible: round 1
used GroupNorm-only blocks, so ported BN weights had nowhere to go.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from gdrnpp_bop2022_tpu.utils.torch_port import (
    convert_yolox_checkpoint, focus_input_perm)

DEP, WID = 0.33, 0.50      # yolox_s
BASE_C = int(WID * 64)     # 32
BASE_D = max(round(DEP * 3), 1)   # 1
NC = 4


def _t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


# -------------------- reference-named random state dict --------------------

def _bc_shapes(prefix, cin, cout, k):
    return {f"{prefix}.conv.weight": (cout, cin, k, k),
            f"{prefix}.bn.weight": (cout,), f"{prefix}.bn.bias": (cout,),
            f"{prefix}.bn.running_mean": (cout,),
            f"{prefix}.bn.running_var": (cout,)}


def _csp_shapes(prefix, cin, cout, n, expansion=0.5):
    h = int(cout * expansion)
    s = {}
    s.update(_bc_shapes(f"{prefix}.conv1", cin, h, 1))
    s.update(_bc_shapes(f"{prefix}.conv2", cin, h, 1))
    s.update(_bc_shapes(f"{prefix}.conv3", 2 * h, cout, 1))
    for i in range(n):
        s.update(_bc_shapes(f"{prefix}.m.{i}.conv1", h, h, 1))
        s.update(_bc_shapes(f"{prefix}.m.{i}.conv2", h, h, 3))
    return s


def yolox_shapes():
    c, d = BASE_C, BASE_D
    bb = "backbone.backbone"
    s = {}
    s.update(_bc_shapes(f"{bb}.stem.conv", 12, c, 3))
    s.update(_bc_shapes(f"{bb}.dark2.0", c, 2 * c, 3))
    s.update(_csp_shapes(f"{bb}.dark2.1", 2 * c, 2 * c, d))
    s.update(_bc_shapes(f"{bb}.dark3.0", 2 * c, 4 * c, 3))
    s.update(_csp_shapes(f"{bb}.dark3.1", 4 * c, 4 * c, d * 3))
    s.update(_bc_shapes(f"{bb}.dark4.0", 4 * c, 8 * c, 3))
    s.update(_csp_shapes(f"{bb}.dark4.1", 8 * c, 8 * c, d * 3))
    s.update(_bc_shapes(f"{bb}.dark5.0", 8 * c, 16 * c, 3))
    s.update(_bc_shapes(f"{bb}.dark5.1.conv1", 16 * c, 8 * c, 1))
    s.update(_bc_shapes(f"{bb}.dark5.1.conv2", 32 * c, 16 * c, 1))
    s.update(_csp_shapes(f"{bb}.dark5.2", 16 * c, 16 * c, d))
    # pafpn (width-scaled channel template from yolo_pafpn.py)
    w = lambda x: int(x * WID)
    s.update(_bc_shapes("backbone.lateral_conv0", w(1024), w(512), 1))
    s.update(_csp_shapes("backbone.C3_p4", w(1024), w(512), d))
    s.update(_bc_shapes("backbone.reduce_conv1", w(512), w(256), 1))
    s.update(_csp_shapes("backbone.C3_p3", w(512), w(256), d))
    s.update(_bc_shapes("backbone.bu_conv2", w(256), w(256), 3))
    s.update(_csp_shapes("backbone.C3_n3", w(512), w(512), d))
    s.update(_bc_shapes("backbone.bu_conv1", w(512), w(512), 3))
    s.update(_csp_shapes("backbone.C3_n4", w(1024), w(1024), d))
    # head
    h = int(256 * WID)
    for i, cin in enumerate((w(256), w(512), w(1024))):
        s.update(_bc_shapes(f"head.stems.{i}", cin, h, 1))
        for j in range(2):
            s.update(_bc_shapes(f"head.cls_convs.{i}.{j}", h, h, 3))
            s.update(_bc_shapes(f"head.reg_convs.{i}.{j}", h, h, 3))
        s[f"head.cls_preds.{i}.weight"] = (NC, h, 1, 1)
        s[f"head.cls_preds.{i}.bias"] = (NC,)
        s[f"head.reg_preds.{i}.weight"] = (4, h, 1, 1)
        s[f"head.reg_preds.{i}.bias"] = (4,)
        s[f"head.obj_preds.{i}.weight"] = (1, h, 1, 1)
        s[f"head.obj_preds.{i}.bias"] = (1,)
    return s


def _rand_sd(shapes, seed=0):
    rs = np.random.RandomState(seed)
    sd = {}
    for k, shape in shapes.items():
        if "running_var" in k:
            sd[k] = rs.uniform(0.5, 2.0, shape).astype(np.float32)
        else:
            sd[k] = (rs.randn(*shape) * 0.1).astype(np.float32)
    return sd


# -------------------- functional torch reference forward --------------------

def bc(sd, p, x, stride=1):
    w = _t(sd[f"{p}.conv.weight"])
    k = w.shape[-1]
    x = F.conv2d(x, w, None, stride, (k - 1) // 2)
    x = F.batch_norm(x, _t(sd[f"{p}.bn.running_mean"]),
                     _t(sd[f"{p}.bn.running_var"]),
                     _t(sd[f"{p}.bn.weight"]), _t(sd[f"{p}.bn.bias"]),
                     False, 0.0, 1e-3)
    return F.silu(x)


def csp(sd, p, x, n, shortcut):
    a = bc(sd, f"{p}.conv1", x)
    b = bc(sd, f"{p}.conv2", x)
    for i in range(n):
        y = bc(sd, f"{p}.m.{i}.conv2", bc(sd, f"{p}.m.{i}.conv1", a))
        a = a + y if shortcut else y
    return bc(sd, f"{p}.conv3", torch.cat([a, b], 1))


def torch_yolox_forward(sd, x):
    bb = "backbone.backbone"
    # Focus (network_blocks.py): [top-left, bottom-left, top-right, bottom-right]
    x = torch.cat([x[..., ::2, ::2], x[..., 1::2, ::2],
                   x[..., ::2, 1::2], x[..., 1::2, 1::2]], 1)
    x = bc(sd, f"{bb}.stem.conv", x)
    x = csp(sd, f"{bb}.dark2.1", bc(sd, f"{bb}.dark2.0", x, 2), BASE_D, True)
    x = csp(sd, f"{bb}.dark3.1", bc(sd, f"{bb}.dark3.0", x, 2), BASE_D * 3, True)
    c3 = x
    x = csp(sd, f"{bb}.dark4.1", bc(sd, f"{bb}.dark4.0", x, 2), BASE_D * 3, True)
    c4 = x
    x = bc(sd, f"{bb}.dark5.0", x, 2)
    # SPP
    x = bc(sd, f"{bb}.dark5.1.conv1", x)
    x = torch.cat([x] + [F.max_pool2d(x, k, 1, k // 2) for k in (5, 9, 13)], 1)
    x = bc(sd, f"{bb}.dark5.1.conv2", x)
    c5 = csp(sd, f"{bb}.dark5.2", x, BASE_D, False)

    up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")
    p5 = bc(sd, "backbone.lateral_conv0", c5)
    f4 = csp(sd, "backbone.C3_p4", torch.cat([up(p5), c4], 1), BASE_D, False)
    p4 = bc(sd, "backbone.reduce_conv1", f4)
    out3 = csp(sd, "backbone.C3_p3", torch.cat([up(p4), c3], 1), BASE_D, False)
    n3 = bc(sd, "backbone.bu_conv2", out3, 2)
    out4 = csp(sd, "backbone.C3_n3", torch.cat([n3, p4], 1), BASE_D, False)
    n4 = bc(sd, "backbone.bu_conv1", out4, 2)
    out5 = csp(sd, "backbone.C3_n4", torch.cat([n4, p5], 1), BASE_D, False)

    outs = []
    for i, f in enumerate((out3, out4, out5)):
        xh = bc(sd, f"head.stems.{i}", f)
        ch = bc(sd, f"head.cls_convs.{i}.1", bc(sd, f"head.cls_convs.{i}.0", xh))
        rh = bc(sd, f"head.reg_convs.{i}.1", bc(sd, f"head.reg_convs.{i}.0", xh))
        cls_o = F.conv2d(ch, _t(sd[f"head.cls_preds.{i}.weight"]),
                         _t(sd[f"head.cls_preds.{i}.bias"]))
        reg_o = F.conv2d(rh, _t(sd[f"head.reg_preds.{i}.weight"]),
                         _t(sd[f"head.reg_preds.{i}.bias"]))
        obj_o = F.conv2d(rh, _t(sd[f"head.obj_preds.{i}.weight"]),
                         _t(sd[f"head.obj_preds.{i}.bias"]))
        outs.append(torch.cat([reg_o, obj_o, cls_o], 1))
    return outs


# ------------------------------- tests --------------------------------------

def test_focus_perm_roundtrip():
    from gdrnpp_bop2022_tpu.models.yolox.darknet import focus_rearrange
    rs = np.random.RandomState(0)
    x = rs.randn(1, 3, 8, 8).astype(np.float32)
    torch_focus = torch.cat([_t(x)[..., ::2, ::2], _t(x)[..., 1::2, ::2],
                             _t(x)[..., ::2, 1::2], _t(x)[..., 1::2, 1::2]],
                            1).numpy()
    mine = np.asarray(focus_rearrange(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    perm = focus_input_perm(3)
    # flax channel i == torch channel perm[i]
    np.testing.assert_allclose(np.transpose(mine, (0, 3, 1, 2)),
                               torch_focus[:, perm])


def test_yolox_full_forward_parity():
    from gdrnpp_bop2022_tpu.models.yolox.yolox import build_yolox
    sd = _rand_sd(yolox_shapes(), 1)
    rs = np.random.RandomState(2)
    x = rs.rand(1, 3, 64, 64).astype(np.float32)

    refs = torch_yolox_forward(sd, _t(x))

    model = build_yolox(NC, "yolox_s", norm="BN", dtype=jnp.float32)
    variables = convert_yolox_checkpoint(sd, dep_mul=DEP, strict=True)
    # tree must match an init tree exactly
    init_v = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 64, 64, 3)))
    assert (jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, init_v))
            == jax.tree_util.tree_structure(
                jax.tree.map(lambda x: 0, dict(variables))))
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(dict(init_v)),
            jax.tree_util.tree_leaves_with_path(variables)):
        assert np.shape(a) == np.shape(b), (kp, np.shape(a), np.shape(b))

    outs = model.apply(variables,
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    for lvl, (got, ref) in enumerate(zip(outs, refs)):
        g = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(g, ref.numpy(), atol=1e-3,
                                   err_msg=f"level {lvl}")


def test_bn_training_updates_stats():
    """BN path trains: batch_stats update under mutable apply."""
    from gdrnpp_bop2022_tpu.models.yolox.darknet import ConvBnAct
    m = ConvBnAct(8, 3, norm="BN", dtype=jnp.float32)
    v = m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 8, 8, 4)))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4)) + 3.0
    _, upd = m.apply(v, x, mutable=["batch_stats"])
    new_mean = np.asarray(jax.tree_util.tree_leaves(upd["batch_stats"])[0])
    old_mean = np.asarray(jax.tree_util.tree_leaves(v["batch_stats"])[0])
    assert not np.allclose(new_mean, old_mean)


def test_bn_training_through_trainer(tmp_path):
    """train_yolox with norm='BN' threads batch_stats through the jitted
    step: running stats move during training and are carried in the
    TrainState (checkpointable)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from synth_utils import build_synth_bop
    from gdrnpp_bop2022_tpu.datasets.bop_data import index_bop_split
    from gdrnpp_bop2022_tpu.datasets.yolox_loader import (
        YoloxTrainLoader, det_records_from_instances)
    from gdrnpp_bop2022_tpu.engine.yolox_trainer import train_yolox

    s = build_synth_bop(tmp_path / "synth", split="train", n_images=2, seed=9)
    recs = index_bop_split(s["split_dir"], s["meta"])
    det_recs = det_records_from_instances(recs)
    loader = YoloxTrainLoader(det_recs, batch_size=2, input_size=64,
                              max_gt=8, seed=0)
    state = train_yolox(det_recs, num_classes=2,
                        output_dir=str(tmp_path / "out"), size="yolox_s",
                        input_size=64, batch_size=2, total_iters=3,
                        mesh_shape=(1,), log_period=1, ckpt_period=100,
                        loader=loader, resume=False, norm="BN")
    assert state.batch_stats is not None
    means = jax.tree_util.tree_leaves(state.batch_stats)
    # stats moved away from the zero-mean init
    assert any(float(jnp.abs(m).max()) > 0 for m in means)
