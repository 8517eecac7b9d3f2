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

Matching follows the BOP toolkit EXACTLY (lib/pysixd/pose_matching.py:9-91
match_poses): matching is re-run PER CORRECTNESS THRESHOLD — estimates
sorted by score are each assigned the unmatched valid GT with the LOWEST
error among those with error < threshold. For vsd every (tau, threshold)
pair is its own correctness definition with its own matching. Recall =
matched / total valid GT instances (score.py:112-113 total recall), and
AR_x averages recall over x's threshold grid.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np
import jax.numpy as jnp

from .pose_error import (add_batch, adi_batch, re_batch, te_batch, proj_batch,
                         mssd_batch, mspd_batch)
from .vsd import vsd_dispatch

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
    vsd_mode: str = "auto",       # auto | window | full (see eval/vsd.py)
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

    # per-threshold true-positive counters (toolkit-exact per-threshold
    # matching) + per-instance aux error rows
    mssd_tp = np.zeros(len(MSSD_THS))
    mspd_tp = np.zeros(len(MSPD_THS))
    vsd_tp = np.zeros((len(VSD_TAUS), len(VSD_THS)))
    mssd_tar = mspd_tar = vsd_tar = 0
    err_rows = {e: [] for e in ("add", "adi", "re", "te", "proj")}

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
        sym_t = getattr(model_bank, "sym_translations", None)
        sym_t = None if sym_t is None else sym_t[label]
        syms_t = (np.zeros((len(syms_R), 3), np.float32) if sym_t is None
                  else np.asarray(sym_t, np.float32))

        n_gt = len(gt_list)
        if "mssd" in errors:
            table = _error_table(ests, gt_list, "mssd", pts, syms_R, syms_t)
            mssd_tar += n_gt
            if table is not None:
                for k, th in enumerate(MSSD_THS):
                    mssd_tp[k] += match_count(table, th * diam)
        if "mspd" in errors:
            table = _error_table(ests, gt_list, "mspd", pts, syms_R, syms_t)
            mspd_tar += n_gt
            if table is not None:
                for k, th in enumerate(MSPD_THS):
                    mspd_tp[k] += match_count(table, th * r_mspd)
        if do_vsd:
            tabs = _vsd_tables(ests, gt_list, key, model_bank, label, diam,
                               depth_test_getter, vsd_delta, vsd_mode)
            if tabs is not False:   # False: depth unavailable -> skip target
                vsd_tar += n_gt
                if tabs is not None:
                    for ti in range(len(VSD_TAUS)):
                        for k, th in enumerate(VSD_THS):
                            vsd_tp[ti, k] += match_count(tabs[:, :, ti], th)

        # aux errors: matched once by min-add (custom-evaluator semantics,
        # gdrn_custom_evaluator.py — not part of BOP AR)
        aux = _aux_errors(ests, gt_list, pts, syms_R, model_bank, label)
        for row in aux:
            for k, v in row.items():
                err_rows[k].append((v, diam))
        for _ in range(n_gt - len(aux)):
            for k in ("add", "adi", "re", "te", "proj"):
                err_rows[k].append((np.inf, diam))

    out = {}
    if mssd_tar:
        out["AR_mssd"] = float(np.mean(mssd_tp / mssd_tar))
    if mspd_tar:
        out["AR_mspd"] = float(np.mean(mspd_tp / mspd_tar))
    if vsd_tar:
        out["AR_vsd"] = float(np.mean(vsd_tp / vsd_tar))
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


def match_count(table: np.ndarray, th: float) -> int:
    """BOP-toolkit match_poses for one correctness threshold
    (lib/pysixd/pose_matching.py:49-91): rows (estimates) are already
    score-sorted; each row matches the unmatched column (GT) with the
    LOWEST error among those with error < th. Returns the match count."""
    ne, ng = table.shape
    used = np.zeros(ng, bool)
    count = 0
    for i in range(ne):
        row = np.where(~used, table[i], np.inf)
        j = int(np.argmin(row))
        if row[j] < th:
            used[j] = True
            count += 1
    return count


def _error_table(ests, gt_list, e_name, pts, syms_R, syms_t):
    """(n_est, n_gt) raw error table for mssd/mspd with FULL symmetry
    transforms (R, t) — BOP symmetries carry translations for off-center
    symmetry axes (lib/pysixd/misc.py get_symmetry_transformations)."""
    if not ests:
        return None
    n = len(ests) * len(gt_list)
    P = jnp.asarray(np.tile(pts[None], (n, 1, 1)))
    sR = jnp.asarray(np.tile(syms_R[None], (n, 1, 1, 1)))
    st = jnp.asarray(np.tile(syms_t[None], (n, 1, 1)))
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
    return _pairwise(ests, gt_list, fn)


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


def _vsd_tables(ests, gt_list, key, bank, label, diam, depth_getter, delta,
                vsd_mode="auto"):
    """(n_est, n_gt, T_taus) vsd error table for per-(tau, th) matching.

    Returns False when the test depth is unavailable (the target is then
    skipped from vsd accounting entirely — counting it as all-miss would
    silently depress AR_vsd), None when there are no estimates (pure miss).
    """
    depth = depth_getter(key[0], key[1])
    if depth is None:
        return False
    if not ests:
        return None
    verts = bank.verts[label]
    faces = bank.faces[label]
    ne, ng = len(ests), len(gt_list)
    n = ne * ng
    Re, te_, Rg, tg = _pose_arrays(ests, gt_list)
    Re_r = np.repeat(Re, ng, axis=0)
    te_r = np.repeat(te_, ng, axis=0)
    Rg_r = np.tile(Rg, (ne, 1, 1))
    tg_r = np.tile(tg, (ne, 1))
    Ks = np.stack([np.asarray(e.get("K", np.eye(3, dtype=np.float32)),
                              np.float32) for e in ests])
    K_r = np.repeat(Ks, ng, axis=0)
    errs = np.asarray(vsd_dispatch(
        jnp.asarray(Re_r), jnp.asarray(te_r), jnp.asarray(Rg_r),
        jnp.asarray(tg_r),
        jnp.asarray(np.tile(depth[None], (n, 1, 1))),
        jnp.asarray(K_r),
        jnp.asarray(np.tile(verts[None], (n, 1, 1))),
        jnp.asarray(np.tile(faces[None], (n, 1, 1))),
        jnp.asarray(np.full(n, diam, np.float32)),
        jnp.asarray(VSD_TAUS), delta, mode=vsd_mode))
    return errs.reshape(ne, ng, -1)
