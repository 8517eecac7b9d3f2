"""BOP19 scoring: greedy est->gt matching + recall averaging.

Replaces the reference's two-stage subprocess pipeline (eval_calc_errors +
eval_calc_scores spawned from lib/pysixd/scripts/eval_pose_results_more.py,
driven by core/gdrn_modeling/engine/test_utils.py:33-80) with an in-process
scorer. Error grids follow eval_pose_results_more.py:41-83:
  vsd : tau in 0.05:0.05:0.5 (diam-normalized), th in 0.05:0.05:0.5,
        delta = 15mm (5mm for itodd)
  mssd: th in 0.05:0.05:0.5 of the object diameter
  mspd: th in 5:5:50 scaled by r = image_width/640
  AR = mean(AR_vsd, AR_mssd, AR_mspd)
Also reports the custom ad/adi/re/te/proj recalls
(gdrn_custom_evaluator.py:622-760).

Matching: per (scene, im, obj), estimates sorted by score are greedily
assigned to the valid GT instance (visib_fract >= 0.1) minimizing the
error, each GT used once (BOP toolkit pose_matching semantics).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from .pose_error import (add_batch, adi_batch, re_batch, te_batch, proj_batch,
                         mssd_batch, mspd_batch)
from .vsd import vsd_batch

MSSD_THS = np.arange(0.05, 0.51, 0.05)
MSPD_THS = np.arange(5, 51, 5)
VSD_TAUS = np.arange(0.05, 0.51, 0.05)
VSD_THS = np.arange(0.05, 0.51, 0.05)


def _group(results):
    g = defaultdict(list)
    for r in results:
        g[(r["scene_id"], r["im_id"], r["obj_id"])].append(r)
    return g


def score_bop_results(
    results: List[dict],          # est: scene_id, im_id, obj_id, score, R, t(m)
    gts: List[dict],              # gt rows: scene_id, im_id, obj_id, R, t(m),
                                  #          visib_fract
    model_bank,                   # bop.models3d.ModelBank (eval models)
    targets: Optional[List[dict]] = None,   # BOP19 targets (scene/im/obj/inst_count)
    im_width: int = 640,
    depth_test_getter=None,       # callable (scene_id, im_id) -> (H, W) depth
    vsd_delta: float = 0.015,
    visib_gt_min: float = 0.1,
    n_top: int = -1,
    errors=("mssd", "mspd", "vsd"),
) -> Dict[str, float]:
    """Compute BOP AR scores (+ aux recalls). Returns a metrics dict."""
    label_of = {oid: i for i, oid in enumerate(model_bank.obj_ids)}
    est_g = _group(results)
    gt_g = _group([g for g in gts if g.get("visib_fract", 1.0) >= visib_gt_min])

    if targets is None:
        targets = [{"scene_id": s, "im_id": i, "obj_id": o,
                    "inst_count": len(v)} for (s, i, o), v in gt_g.items()]

    do_vsd = "vsd" in errors and depth_test_getter is not None
    r_mspd = im_width / 640.0

    # per-error accumulators: list of per-target-instance "best error" rows
    err_rows = {e: [] for e in ("mssd", "mspd", "add", "adi", "re", "te", "proj")}
    vsd_rows = []   # (T_taus,) arrays

    for tgt in targets:
        key = (int(tgt["scene_id"]), int(tgt["im_id"]), int(tgt["obj_id"]))
        n_inst = int(tgt.get("inst_count", 1))
        top = n_inst if n_top == -1 else n_top
        gt_list = gt_g.get(key, [])
        if not gt_list:
            continue
        ests = sorted(est_g.get(key, []), key=lambda r: -r["score"])[:top]
        label = label_of[key[2]]
        pts = model_bank.points[label]
        diam = float(model_bank.diameters[label])
        sym = model_bank.sym_rotations[label]
        syms_R = np.stack([np.eye(3, dtype=np.float32)] if sym is None
                          else list(sym)).astype(np.float32)
        S = len(syms_R)

        n_gt = len(gt_list)
        matched_gt = set()
        # build full est x gt error tables (mssd as the matching error,
        # following BOP which matches per error type; we match per type below)
        for e_name in [e for e in ("mssd", "mspd") if e in errors]:
            matched = _greedy_match(
                ests, gt_list, e_name, pts, syms_R, model_bank, label,
                r_mspd=r_mspd)
            for err in matched:     # one per matched gt (unmatched -> inf)
                err_rows[e_name].append((err, diam))
            # unmatched gt instances count as misses
            for _ in range(n_gt - len(matched)):
                err_rows[e_name].append((np.inf, diam))

        if do_vsd:
            vsd_rows.extend(_vsd_match(
                ests, gt_list, key, pts, model_bank, label, diam,
                depth_test_getter, vsd_delta))
            for _ in range(n_gt - min(len(ests), n_gt)):
                vsd_rows.append(np.full(len(VSD_TAUS), np.inf))

        # aux errors use mssd's matching (ad/re/te computed on same pairs)
        aux = _aux_errors(ests, gt_list, pts, syms_R, model_bank, label)
        for row in aux:
            for k, v in row.items():
                err_rows[k].append((v, diam))
        for _ in range(n_gt - len(aux)):
            for k in ("add", "adi", "re", "te", "proj"):
                err_rows[k].append((np.inf, diam))

    out = {}
    if err_rows["mssd"]:
        errs = np.array([e for e, _ in err_rows["mssd"]])
        diams = np.array([d for _, d in err_rows["mssd"]])
        out["AR_mssd"] = float(np.mean([
            np.mean(errs < th * diams) for th in MSSD_THS]))
    if err_rows["mspd"]:
        errs = np.array([e for e, _ in err_rows["mspd"]])
        out["AR_mspd"] = float(np.mean([
            np.mean(errs < th * r_mspd) for th in MSPD_THS]))
    if vsd_rows:
        v = np.stack(vsd_rows)  # (N, T)
        out["AR_vsd"] = float(np.mean([
            np.mean(v < th) for th in VSD_THS]))
    ar_parts = [out[k] for k in ("AR_vsd", "AR_mssd", "AR_mspd") if k in out]
    if ar_parts:
        out["AR"] = float(np.mean(ar_parts))

    # custom evaluator recalls (reference thresholds: 2/5/10% diam, 2/5 deg/cm)
    if err_rows["add"]:
        for name in ("add", "adi"):
            errs = np.array([e for e, _ in err_rows[name]])
            diams = np.array([d for _, d in err_rows[name]])
            for th in (0.02, 0.05, 0.10):
                out[f"{name}_{int(th*100)}"] = float(np.mean(errs < th * diams))
        re_errs = np.array([e for e, _ in err_rows["re"]])
        te_errs = np.array([e for e, _ in err_rows["te"]])
        out["re_2"] = float(np.mean(re_errs < 2.0))
        out["re_5"] = float(np.mean(re_errs < 5.0))
        out["te_2cm"] = float(np.mean(te_errs < 0.02))
        out["te_5cm"] = float(np.mean(te_errs < 0.05))
        pj = np.array([e for e, _ in err_rows["proj"]])
        for th in (2, 5, 10):
            out[f"proj_{th}"] = float(np.mean(pj < th))
        # ADD(-S) AUC up to 10 cm (YCB-V standard; reference AUC tables,
        # test_utils.py:220+): VOC-style area under the accuracy curve
        for name in ("add", "adi"):
            errs = np.array([e for e, _ in err_rows[name]])
            out[f"auc_{name}_10cm"] = auc_of_errors(errs, max_err=0.10)
    return out


def auc_of_errors(errs: np.ndarray, max_err: float = 0.10, steps: int = 100) -> float:
    """Area under the accuracy-vs-threshold curve, thresholds in
    [0, max_err] (the PoseCNN/YCB-V ADD-S AUC definition)."""
    ths = np.linspace(0, max_err, steps + 1)[1:]
    return float(np.mean([(errs < t).mean() for t in ths]))


def per_object_scores(results, gts, model_bank, obj_ids=None, **kwargs):
    """Per-object score table + object-count-weighted mean AR (reference:
    test_utils.py tabulate output with weighted averages)."""
    by_obj = sorted({g["obj_id"] for g in gts}) if obj_ids is None else obj_ids
    table = {}
    counts = {}
    for oid in by_obj:
        g = [x for x in gts if x["obj_id"] == oid]
        r = [x for x in results if x["obj_id"] == oid]
        counts[oid] = len(g)
        table[oid] = score_bop_results(r, g, model_bank, **kwargs)
    ars = [(table[o].get("AR"), counts[o]) for o in by_obj
           if table[o].get("AR") is not None]
    if ars:
        total = sum(c for _, c in ars)
        table["weighted_mean_AR"] = float(
            sum(a * c for a, c in ars) / max(total, 1))
    return table


def _pose_arrays(ests, gt_list):
    Re = np.stack([np.asarray(e["R"], np.float32) for e in ests])
    te_ = np.stack([np.asarray(e["t"], np.float32).ravel() for e in ests])
    Rg = np.stack([np.asarray(g["R"], np.float32) for g in gt_list])
    tg = np.stack([np.asarray(g["t"], np.float32).ravel() for g in gt_list])
    return Re, te_, Rg, tg


def _pairwise(ests, gt_list, fn):
    """fn(R_est, t_est, R_gt, t_gt) batched -> (n_est, n_gt) error table."""
    Re, te_, Rg, tg = _pose_arrays(ests, gt_list)
    ne, ng = len(ests), len(gt_list)
    Re_r = np.repeat(Re, ng, axis=0)
    te_r = np.repeat(te_, ng, axis=0)
    Rg_r = np.tile(Rg, (ne, 1, 1))
    tg_r = np.tile(tg, (ne, 1))
    return np.asarray(fn(Re_r, te_r, Rg_r, tg_r)).reshape(ne, ng)


def _greedy(table):
    """Greedy row-order matching; returns list of matched errors."""
    used = set()
    out = []
    for i in range(table.shape[0]):
        cand = [(table[i, j], j) for j in range(table.shape[1]) if j not in used]
        if not cand:
            break
        err, j = min(cand)
        used.add(j)
        out.append(err)
    return out


def _greedy_match(ests, gt_list, e_name, pts, syms_R, bank, label, r_mspd=1.0):
    if not ests:
        return []
    n = len(ests) * len(gt_list)
    P = jnp.asarray(np.tile(pts[None], (n, 1, 1)))
    sR = jnp.asarray(np.tile(syms_R[None], (n, 1, 1, 1)))
    st = jnp.zeros((n, syms_R.shape[0], 3))
    sv = jnp.ones((n, syms_R.shape[0]), bool)
    if e_name == "mssd":
        fn = lambda Re, te_, Rg, tg: mssd_batch(
            jnp.asarray(Re), jnp.asarray(te_), jnp.asarray(Rg), jnp.asarray(tg),
            P, sR, st, sv)
    else:
        K = np.tile(ests[0].get("K", np.eye(3, dtype=np.float32))[None],
                    (n, 1, 1))
        fn = lambda Re, te_, Rg, tg: mspd_batch(
            jnp.asarray(Re), jnp.asarray(te_), jnp.asarray(Rg), jnp.asarray(tg),
            jnp.asarray(K), P, sR, st, sv)
    table = _pairwise(ests, gt_list, fn)
    return _greedy(table)


def _aux_errors(ests, gt_list, pts, syms_R, bank, label):
    """add/adi/re/te/proj for greedily matched (by add) pairs."""
    if not ests:
        return []
    n = len(ests) * len(gt_list)
    P = jnp.asarray(np.tile(pts[None], (n, 1, 1)))
    table = _pairwise(ests, gt_list,
                      lambda Re, te_, Rg, tg: add_batch(
                          jnp.asarray(Re), jnp.asarray(te_),
                          jnp.asarray(Rg), jnp.asarray(tg), P))
    used = set()
    rows = []
    for i in range(table.shape[0]):
        cand = [(table[i, j], j) for j in range(table.shape[1]) if j not in used]
        if not cand:
            break
        _, j = min(cand)
        used.add(j)
        e, g = ests[i], gt_list[j]
        Re = jnp.asarray(np.asarray(e["R"], np.float32))[None]
        te_ = jnp.asarray(np.asarray(e["t"], np.float32).ravel())[None]
        Rg = jnp.asarray(np.asarray(g["R"], np.float32))[None]
        tg = jnp.asarray(np.asarray(g["t"], np.float32).ravel())[None]
        P1 = jnp.asarray(pts)[None]
        K = jnp.asarray(e.get("K", np.eye(3, dtype=np.float32)))[None]
        rows.append({
            "add": float(add_batch(Re, te_, Rg, tg, P1)[0]),
            "adi": float(adi_batch(Re, te_, Rg, tg, P1)[0]),
            "re": float(re_batch(Re, Rg)[0]),
            "te": float(te_batch(te_, tg)[0]),
            "proj": float(proj_batch(Re, te_, Rg, tg, K, P1)[0]),
        })
    return rows


def _vsd_match(ests, gt_list, key, pts, bank, label, diam,
               depth_getter, delta):
    """Greedy vsd matching: match by mean-over-taus error."""
    if not ests:
        return []
    depth = depth_getter(key[0], key[1])
    if depth is None:
        return []
    rows = []
    verts = bank.verts[label]
    faces = bank.faces[label]
    used = set()
    for e in ests:
        tabs = []
        for j, g in enumerate(gt_list):
            if j in used:
                tabs.append((np.inf, None, j))
                continue
            errs = np.asarray(vsd_batch(
                jnp.asarray(np.asarray(e["R"], np.float32))[None],
                jnp.asarray(np.asarray(e["t"], np.float32).ravel())[None],
                jnp.asarray(np.asarray(g["R"], np.float32))[None],
                jnp.asarray(np.asarray(g["t"], np.float32).ravel())[None],
                jnp.asarray(depth)[None],
                jnp.asarray(e.get("K", np.eye(3, dtype=np.float32)))[None],
                jnp.asarray(verts)[None], jnp.asarray(faces)[None],
                jnp.asarray([diam]), jnp.asarray(VSD_TAUS), delta))[0]
            tabs.append((float(errs.mean()), errs, j))
        tabs.sort(key=lambda x: x[0])
        if tabs and tabs[0][1] is not None:
            used.add(tabs[0][2])
            rows.append(tabs[0][1])
    return rows
