"""Full-scale twin-accuracy benchmark: reference torch vs this framework.

The strongest "same trained model" evidence obtainable without real
datasets on disk, at PRODUCTION width (tests/test_trained_equivalence.py
runs the same protocol at reduced width / 64^2): both frameworks start
from the SAME weights, train FULL-WIDTH models for over a thousand
identical optimizer steps (identical images, targets, batch order, Adam
schedule) on a generalization-capable synthetic localization task
(thousands of distinct training images, held-out eval split with unseen
marker positions), and the trained models are scored through one shared
batched DARK decoder with the reference's own metrics (PCK@0.2 / PCK@0.05
/ AUC / EPE, base_dataset.py:193-261 semantics).

Weight trajectories decorrelate chaotically over this horizon (train-mode
BatchNorm), so the claim — like the reference lifecycle it mirrors
(dist_train.py:50-289 + test.py:63-155) — is at the METRIC level: both
frameworks learn equally good models from the same data and schedule.

The two sides run as separate processes (the torch side takes CPU-hours;
the flax side minutes on a TPU), each writing a json; `--side report`
merges them into a markdown table:

    python -m litehandnet_tpu.tools.twin_accuracy --side flax
    python -m litehandnet_tpu.tools.twin_accuracy --side torch
    python -m litehandnet_tpu.tools.twin_accuracy --side report \
        --report-out ACCURACY_TWIN.md

Identical init across the two processes: both sides build the reference
torch model and re-initialize it with the deterministic CPU-seeded
reinit used by the parity suite; a checksum of the first conv kernel is
stored in each side's json and cross-checked at report time.
"""

from __future__ import annotations

import argparse
import hashlib
import itertools
import json
import os
import time

import numpy as np

K = 21


def _marker_colors():
    """21 well-separated RGB-cube colours (tests/test_trained_equivalence)."""
    grid = [np.array(c, np.float32)
            for c in itertools.product((0.0, 0.5, 1.0), repeat=3)]
    return np.stack([c for c in grid if c.sum() >= 1.0][:K])


def make_split(seed: int, n: int, size: int, marker_sigma: float = 2.5):
    """n images of 21 colour markers at uniform-random positions with
    per-marker amplitude jitter on noise — positions are continuous, so
    train/eval splits are disjoint by construction. Returns
    (images float32 [n,S,S,3] in [-1,1], joints [n,K,2])."""
    rng = np.random.RandomState(seed)
    colors = _marker_colors()
    yy, xx = np.mgrid[:size, :size].astype(np.float32)
    joints = rng.uniform(8, size - 8, size=(n, K, 2)).astype(np.float32)
    amps = rng.uniform(0.5, 1.0, size=(n, K)).astype(np.float32)
    imgs = np.empty((n, size, size, 3), np.float32)
    for i in range(n):
        img = rng.uniform(0, 0.3, (size, size, 3)).astype(np.float32)
        for k in range(K):
            x, y = joints[i, k]
            blob = np.exp(-((xx - x) ** 2 + (yy - y) ** 2)
                          / (2 * marker_sigma**2))
            img += (amps[i, k] * blob)[..., None] * colors[k]
        imgs[i] = np.clip(img, 0.0, 1.0)
    return imgs * 2.0 - 1.0, joints


def srhandnet_targets(joints, size: int, out_hw):
    """Per-scale SRHandNet targets: 21 kpt gaussians + the region-map
    triple (center gaussian, 5x5 w/h-ratio patches around the center
    cell) — the layout SRHandNetGenerateTarget paints
    (generateTarget.py:321-366). Center/size derive from the joint cloud,
    so both region channels are learnable from the image. Mirrors
    tests/test_trained_equivalence._srhandnet_targets at full scale,
    batched through the golden-tested encoder."""
    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.ops.encode import msra_heatmaps

    n = joints.shape[0]
    centers = joints.mean(axis=1, keepdims=True)           # [N, 1, 2] px
    wh = ((joints.max(1) - joints.min(1)) / size).astype(np.float32)
    outs = []
    for h, w in out_hw:
        def make_enc(k, h=h, w=w):
            def one(j):
                t, _ = msra_heatmaps(j, jnp.ones((k,)), (size, size),
                                     (h, w), 2.0, unbiased=True)
                return t

            return jax.jit(jax.vmap(one))

        enc_k, enc_c = make_enc(K), make_enc(1)
        kpt, cen = [], []
        for j in range(0, n, 256):
            kpt.append(np.asarray(enc_k(jnp.asarray(joints[j:j + 256]))))
            cen.append(np.asarray(enc_c(jnp.asarray(centers[j:j + 256]))))
        kpt, cen = np.concatenate(kpt), np.concatenate(cen)
        whmap = np.zeros((n, h, w, 2), np.float32)
        cx = np.clip((centers[:, 0, 0] * w / size).astype(int), 0, w - 1)
        cy = np.clip((centers[:, 0, 1] * h / size).astype(int), 0, h - 1)
        for i in range(n):
            whmap[i, max(cy[i] - 2, 0):cy[i] + 3,
                  max(cx[i] - 2, 0):cx[i] + 3] = wh[i]
        outs.append(np.concatenate([kpt, cen, whmap], -1).astype(np.float32))
    return outs


def heatmap_targets(joints, size: int, hm: int, sigma: float = 2.0):
    """Unbiased-encoding Gaussian heatmaps via the golden-tested encoder
    (ops/encode.msra_heatmaps, the reference's unbiased_encoding path,
    generateTarget.py:100-123). joints [N,K,2] image px -> [N, hm, hm, K].
    Computed once up front and indexed per batch, so both sides consume
    the exact same bytes."""
    import jax
    import jax.numpy as jnp

    from litehandnet_tpu.ops.encode import msra_heatmaps

    @jax.jit
    def enc(batch_joints):
        def one(j):
            t, _ = msra_heatmaps(j, jnp.ones((K,)), (size, size), (hm, hm),
                                 sigma, unbiased=True)
            return t

        return jax.vmap(one)(batch_joints)

    outs = []
    for j in range(0, len(joints), 256):
        outs.append(np.asarray(enc(jnp.asarray(joints[j:j + 256]))))
    return np.concatenate(outs).astype(np.float32)


def batch_schedule(seed: int, n: int, batch: int, steps: int):
    rng = np.random.RandomState(seed)
    batches = []
    while len(batches) < steps:
        perm = rng.permutation(n)
        batches += [perm[j:j + batch]
                    for j in range(0, n - batch + 1, batch)]
    return batches[:steps]


def _init_state_dict(refcfg_path: str):
    """Deterministic shared init: the reference torch model re-initialized
    with the parity suite's seeded reinit."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from tests import ref_loader
    from tests.test_forward_parity import sane_reinit

    import torch

    refcfg = ref_loader.load_ref_config(refcfg_path)
    tm = ref_loader.build_ref_model(refcfg)
    sane_reinit(tm)
    for mod in tm.modules():  # dropout cannot be twinned across frameworks
        if isinstance(mod, (torch.nn.Dropout, torch.nn.Dropout2d)):
            mod.p = 0.0
    return refcfg, tm


def _checksum(sd):
    name = sorted(k for k in sd if k.endswith("weight"))[0]
    arr = np.ascontiguousarray(np.asarray(sd[name].detach()))
    return name, hashlib.sha256(arr.tobytes()).hexdigest()[:16]


def decode_and_score(hm_nhwc, joints, size: int):
    """Shared decode + reference metrics (one implementation, both sides)."""
    import jax.numpy as jnp

    from litehandnet_tpu.eval.metrics import (
        keypoint_auc, keypoint_epe, keypoint_pck_accuracy,
    )
    from litehandnet_tpu.ops.decode import keypoints_from_heatmaps

    n = hm_nhwc.shape[0]
    center = np.tile([[size / 2.0, size / 2.0]], (n, 1)).astype(np.float32)
    scale = np.tile([[size / 200.0, size / 200.0]], (n, 1)).astype(np.float32)
    _, preds, _ = keypoints_from_heatmaps(
        jnp.asarray(hm_nhwc), jnp.asarray(center), jnp.asarray(scale),
        post_process="unbiased", kernel=11,
    )
    preds = np.asarray(preds)
    mask = np.ones((n, K), bool)
    norm = np.tile([[size, size]], (n, 1)).astype(np.float32)
    _, pck20, _ = keypoint_pck_accuracy(preds, joints, mask, 0.2, norm)
    _, pck05, _ = keypoint_pck_accuracy(preds, joints, mask, 0.05, norm)
    auc = keypoint_auc(preds, joints, mask, float(size), num_step=20)
    epe = keypoint_epe(preds, joints, mask)
    return dict(pck20=float(pck20), pck05=float(pck05), auc=float(auc),
                epe=float(epe))


def run_torch_side(args, data):
    import torch

    refcfg, tm = _init_state_dict(args.refcfg)
    name, digest = _checksum(tm.state_dict())
    train_imgs, train_joints, eval_imgs, eval_joints, batches = data
    hm = args.size // 4
    import importlib

    from tests import ref_loader

    ref_loader.ensure_reference_importable()
    criterion = importlib.import_module("loss").get_loss(refcfg)
    criterion.train()
    if args.mode == "srhandnet":
        # probe the 4-output pyramid's per-scale shapes (test.py:117 path)
        with torch.no_grad():
            probe = tm(torch.zeros(1, 3, args.size, args.size))
        out_hw = [tuple(o.shape[2:]) for o in probe]
        train_tgts_ms = srhandnet_targets(train_joints, args.size, out_hw)
        weights = np.ones((args.batch, K + 3, 1), np.float32)
    else:
        train_tgts = heatmap_targets(train_joints, args.size, hm)
        weights = np.ones((args.batch, K, 1), np.float32)
    tm.train()
    opt = torch.optim.Adam(
        list(tm.parameters()) + list(criterion.parameters()), lr=args.lr
    )
    losses = []
    t0 = time.time()
    # Checkpoint/resume: the torch control costs CPU-hours on this rig and
    # the loop is deterministic given the precomputed batch order (dropout
    # zeroed, no in-loop RNG), so periodic state_dict snapshots make the
    # run restartable after a session death with zero trajectory change.
    ckpt_path = os.path.join(args.workdir, "torch_ckpt.pt")
    start_si, prev_wall = 0, 0.0
    if os.path.exists(ckpt_path):
        ck = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if ck.get("fingerprint") == [args.family, args.size, args.steps,
                                     args.seed, args.lr]:
            tm.load_state_dict(ck["model"])
            opt.load_state_dict(ck["optimizer"])
            criterion.load_state_dict(ck["criterion"])
            losses = list(ck["losses"])
            start_si, prev_wall = ck["next_si"], ck["wall_s"]
            print(f"torch resume from step {start_si} "
                  f"({prev_wall:.0f}s banked)", flush=True)
    # ascontiguousarray: conv backward on strided transpose views hits a
    # libtorch_cpu general-protection fault on some builds (observed on
    # this rig); contiguous NCHW input avoids the broken kernel path
    for si, idx in enumerate(batches):
        if si < start_si:
            continue
        x = torch.from_numpy(
            np.ascontiguousarray(train_imgs[idx].transpose(0, 3, 1, 2)))
        if args.mode == "srhandnet":
            meta = {
                "target": [
                    torch.from_numpy(np.ascontiguousarray(
                        t[idx].transpose(0, 3, 1, 2)))
                    for t in train_tgts_ms
                ],
                "target_weight": [torch.from_numpy(weights)] * len(out_hw),
            }
        else:
            meta = {
                "target": torch.from_numpy(np.ascontiguousarray(
                    train_tgts[idx].transpose(0, 3, 1, 2))),
                "target_weight": torch.from_numpy(weights),
            }
        loss, _ = criterion(tm(x), meta)
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        if si % 25 == 0:
            print(f"torch step {si}/{len(batches)} loss={losses[-1]:.6f} "
                  f"({prev_wall + time.time() - t0:.0f}s)", flush=True)
            tmp = ckpt_path + ".tmp"
            torch.save({
                "fingerprint": [args.family, args.size, args.steps,
                                args.seed, args.lr],
                "model": tm.state_dict(),
                "optimizer": opt.state_dict(),
                "criterion": criterion.state_dict(),
                "losses": losses, "next_si": si + 1,
                "wall_s": prev_wall + time.time() - t0,
            }, tmp)
            os.replace(tmp, ckpt_path)

    tm.eval()
    with torch.no_grad():
        def fwd(imgs):
            outs = []
            for j in range(0, len(imgs), args.batch):
                o = tm(torch.from_numpy(np.ascontiguousarray(
                    imgs[j:j + args.batch].transpose(0, 3, 1, 2))))
                if args.mode == "srhandnet":  # last scale, kpt channels
                    o = o[-1][:, :K]
                outs.append(np.asarray(o).transpose(0, 2, 3, 1))
            return np.concatenate(outs)

        ev = decode_and_score(fwd(eval_imgs), eval_joints, args.size)
        tr = decode_and_score(
            fwd(train_imgs[: len(eval_imgs)]),
            train_joints[: len(eval_imgs)], args.size,
        )
    return dict(side="torch", init_checksum=[name, digest],
                loss_first=losses[0], loss_tail=float(np.mean(losses[-25:])),
                train=tr, eval=ev, wall_s=prev_wall + time.time() - t0)


def run_flax_side(args, data):
    import jax

    # f32-faithful convs on TPU (the torch side is f32 CPU); without this
    # the default bf16 matmul precision puts ~1e-3 rel on the step-0 loss.
    # --matmul-precision default gives a REPLICATE with different per-step
    # rounding — the right null distribution for a cross-framework delta,
    # which accumulates per-step float divergence, not just an init epsilon
    jax.config.update("jax_default_matmul_precision",
                      args.matmul_precision)
    import jax.numpy as jnp
    import optax

    from flax import linen as fnn

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.losses import get_loss
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.utils.torch_import import import_torch_state_dict

    # dropout randomness cannot be twinned across frameworks: neutralized
    # identically on both sides (_init_state_dict sets torch p=0; p=0 and
    # identity have the same 1/(1-p)=1 scale)
    fnn.Dropout.__call__ = lambda self, x, *a, **kw: x

    refcfg, tm = _init_state_dict(args.refcfg)
    name, digest = _checksum(tm.state_dict())
    train_imgs, train_joints, eval_imgs, eval_joints, batches = data
    hm = args.size // 4

    cfg = config_from_dict(dict(refcfg))
    model = get_model(cfg)
    target_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3)),
        train=False,
    )
    variables = import_torch_state_dict(
        args.family, tm.state_dict(), target_vars
    )
    if args.perturb:
        # chaos-band replicate: add a RELATIVE epsilon of gaussian noise to
        # every parameter leaf. The run is otherwise byte-identical (same
        # corpus, targets, batch order, optimizer), so the spread of final
        # metrics across perturb seeds measures exactly how much the twin
        # protocol's trained-metric outcome is amplified from an
        # infinitesimal weight difference — the null distribution against
        # which a torch-vs-flax delta must be judged (TWIN_AUC.md chaos
        # band; train-mode BatchNorm makes trajectories chaotic).
        prng = np.random.RandomState(args.perturb_seed)

        def _pert(x):
            a = np.asarray(x)
            if a.dtype.kind != "f" or a.size == 0:
                return x
            scale = float(np.abs(a).std()) or 1.0
            return jnp.asarray(
                a + (args.perturb * scale
                     * prng.standard_normal(a.shape)).astype(a.dtype))

        variables = {
            "params": jax.tree.map(_pert, variables["params"]),
            "batch_stats": variables["batch_stats"],
        }
    criterion = get_loss(cfg)
    weights = np.ones((args.batch, K), np.float32)
    if args.mode == "srhandnet":
        probe = jax.eval_shape(
            lambda v: model.apply(v, jnp.zeros((1, args.size, args.size, 3)),
                                  train=False), target_vars)
        out_hw = [tuple(o.shape[1:3]) for o in probe]
        train_tgts_ms = srhandnet_targets(train_joints, args.size, out_hw)
        weights_sr = np.ones((args.batch, K + 3), np.float32)
    else:
        train_tgts = heatmap_targets(train_joints, args.size, hm)
    tx = optax.adam(args.lr)
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, x, batch):
        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss, _ = criterion.apply({"params": {}}, out, batch)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, new_opt, loss

    losses = []
    t0 = time.time()
    for si, idx in enumerate(batches):
        if args.mode == "srhandnet":
            batch = {
                "target": [jnp.asarray(t[idx]) for t in train_tgts_ms],
                "target_weight": [jnp.asarray(weights_sr)] * len(out_hw),
            }
        else:
            batch = {"target": jnp.asarray(train_tgts[idx]),
                     "target_weight": jnp.asarray(weights)}
        params, stats, opt_state, loss = step(
            params, stats, opt_state, jnp.asarray(train_imgs[idx]), batch,
        )
        losses.append(float(loss))
        if si % 100 == 0:
            print(f"flax step {si}/{len(batches)} loss={losses[-1]:.6f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    fv = {"params": params, "batch_stats": stats}

    def run_fwd(imgs):
        outs = []
        for j in range(0, len(imgs), args.batch):
            o = fwd(fv, jnp.asarray(imgs[j:j + args.batch]))
            if args.mode == "srhandnet":  # last scale, kpt channels
                o = o[-1][..., :K]
            outs.append(np.asarray(o))
        return np.concatenate(outs)

    ev = decode_and_score(run_fwd(eval_imgs), eval_joints, args.size)
    tr = decode_and_score(
        run_fwd(train_imgs[: len(eval_imgs)]),
        train_joints[: len(eval_imgs)], args.size,
    )
    return dict(side="flax", init_checksum=[name, digest],
                loss_first=losses[0], loss_tail=float(np.mean(losses[-25:])),
                train=tr, eval=ev, wall_s=time.time() - t0)


def write_report(args):
    def load(side):
        with open(os.path.join(args.workdir, f"{side}.json")) as f:
            return json.load(f)

    t, f = load("torch"), load("flax")
    assert t["init_checksum"] == f["init_checksum"], (
        "the two sides did not start from the same weights",
        t["init_checksum"], f["init_checksum"],
    )
    # the protocol is what the SIDES ran, not what the report invocation's
    # CLI defaults happen to be — read it from the stored jsons and require
    # the two sides to agree (mirrors write_report_all); fall back to the
    # CLI args for pre-round-5 jsons that carry no "args" block
    proto_keys = ("family", "refcfg", "mode", "size", "train_n", "eval_n",
                  "batch", "steps", "lr", "seed")
    ta, fa = t.get("args"), f.get("args")
    if ta and fa:
        mismatch = {k: (ta.get(k), fa.get(k)) for k in proto_keys
                    if ta.get(k) != fa.get(k)}
        assert not mismatch, ("the two sides ran different protocols",
                              mismatch)
    a = ta or vars(args)
    lines = [
        "# ACCURACY_TWIN — full-width twin-training accuracy parity",
        "",
        f"Protocol: `tools/twin_accuracy.py` — family `{a['family']}`, "
        f"full-width, {a['size']}x{a['size']} input, {a['steps']} identical "
        f"Adam steps (lr {a['lr']}, batch {a['batch']}) on {a['train_n']} "
        f"synthetic marker images; {a['eval_n']} held-out images with "
        "unseen marker positions; one shared batched DARK decoder + the "
        "reference metric formulas for both sides. Init checksum "
        f"`{t['init_checksum'][1]}` verified identical.",
        "",
        "| side | split | PCK@0.2 | PCK@0.05 | AUC | EPE px | tail loss |",
        "|---|---|---|---|---|---|---|",
    ]
    for side, r in (("torch (reference)", t), ("flax/TPU (this repo)", f)):
        for split in ("train", "eval"):
            m = r[split]
            lines.append(
                f"| {side} | {split} | {m['pck20']:.4f} | {m['pck05']:.4f} "
                f"| {m['auc']:.4f} | {m['epe']:.3f} | "
                f"{r['loss_tail']:.6f} |"
            )
    lines += [
        "",
        f"Wall time: torch {t['wall_s']:.0f}s (CPU), "
        f"flax {f['wall_s']:.0f}s.",
        "",
        "Step-0 losses: torch "
        f"{t['loss_first']:.6f} vs flax {f['loss_first']:.6f} "
        "(identical transferred init, identical first batch).",
    ]
    out = args.report_out
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return out


def write_report_all(args):
    """Merge every family's torch.json + flax.json under --workdir into
    one markdown table directly comparable to the reference's
    model_performance.png AUC table (README.md:4)."""
    rows = []
    for tag in sorted(os.listdir(args.workdir)):
        d = os.path.join(args.workdir, tag)
        tj, fj = os.path.join(d, "torch.json"), os.path.join(d, "flax.json")
        if not (os.path.isfile(tj) and os.path.isfile(fj)):
            continue
        with open(tj) as f:
            t = json.load(f)
        with open(fj) as f:
            fl = json.load(f)
        assert t["init_checksum"] == fl["init_checksum"], (
            tag, t["init_checksum"], fl["init_checksum"])
        # same checksum does not imply same protocol (a side re-run with
        # different --steps would silently skew the deltas): require the
        # protocol args to match before pairing the two sides
        proto = ("family", "refcfg", "mode", "size", "train_n", "eval_n",
                 "batch", "steps", "lr", "seed")
        mismatch = {k: (t["args"].get(k), fl["args"].get(k))
                    for k in proto if t["args"].get(k) != fl["args"].get(k)}
        assert not mismatch, (tag, mismatch)
        rows.append((tag, t, fl))
    if not rows:
        raise SystemExit(f"no completed family pairs under {args.workdir}")
    a0 = rows[0][1]["args"]
    lines = [
        "# TWIN_AUC — full-width twin-training accuracy, all table families",
        "",
        "Both frameworks start from identical weights (checksum verified), "
        "train the FULL-WIDTH model for the same long schedule on the same "
        "synthetic marker corpus (disjoint held-out split), and are scored "
        "through one shared DARK decoder + the reference metric formulas "
        "(top_down_eval.py:65-196 semantics). Columns are held-out (eval) "
        "metrics; Δ = flax − torch.",
        "",
        f"Protocol: {a0['size']}x{a0['size']} input, {a0['train_n']} train / "
        f"{a0['eval_n']} held-out images, batch {a0['batch']}, Adam lr "
        f"{a0['lr']}. Steps per family below. (256² full-length was "
        "measured at 40 s/step torch-CPU on this 1-core rig — ~11 h per "
        "family — so the grid runs at 128² full width; see TWIN_AUC.md "
        "notes.)",
        "",
        "| family | steps | side | eval AUC | eval PCK@0.2 | eval PCK@0.05 "
        "| eval EPE px | train AUC | tail loss |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    deltas = []
    for tag, t, fl in rows:
        steps = t["args"]["steps"]
        for side, r in (("torch (ref)", t), ("flax/TPU", fl)):
            m, mt = r["eval"], r["train"]
            lines.append(
                f"| {tag} | {steps} | {side} | {m['auc']:.4f} "
                f"| {m['pck20']:.4f} | {m['pck05']:.4f} | {m['epe']:.3f} "
                f"| {mt['auc']:.4f} | {r['loss_tail']:.6f} |"
            )
        d_auc = fl["eval"]["auc"] - t["eval"]["auc"]
        d_pck = fl["eval"]["pck20"] - t["eval"]["pck20"]
        d_epe = fl["eval"]["epe"] - t["eval"]["epe"]
        deltas.append((tag, d_auc, d_pck, d_epe,
                       t["loss_first"], fl["loss_first"]))
    lines += ["", "## Deltas (flax − torch)", "",
              "| family | ΔAUC | ΔPCK@0.2 | ΔEPE px | step-0 loss "
              "torch | step-0 loss flax |", "|---|---|---|---|---|---|"]
    for tag, da, dp, de, lt, lf in deltas:
        lines.append(f"| {tag} | {da:+.4f} | {dp:+.4f} | {de:+.3f} "
                     f"| {lt:.6f} | {lf:.6f} |")
    with open(args.report_out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    return args.report_out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--side", choices=["torch", "flax", "report",
                                      "report-all"], required=True)
    p.add_argument("--family", default="litehandnet")
    p.add_argument(
        "--refcfg",
        default="config/litehandnet/_2_freihand_224x244_dark_h4_ca_none.py",
    )
    p.add_argument("--mode", choices=["heatmap", "srhandnet"],
                   default="heatmap")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--train-n", type=int, default=2048)
    p.add_argument("--eval-n", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--perturb", type=float, default=0.0,
                   help="flax side only: relative init-perturbation epsilon "
                        "for chaos-band replicates (output goes to "
                        "flax_pert<perturb-seed>.json, never flax.json)")
    p.add_argument("--perturb-seed", type=int, default=1)
    p.add_argument("--matmul-precision", default="highest",
                   choices=["default", "high", "highest"],
                   help="flax side only: jax matmul precision; 'default' "
                        "(bf16 inputs) is a per-step-rounding replicate")
    p.add_argument("--workdir", default="/tmp/twin_accuracy")
    p.add_argument("--report-out", default="ACCURACY_TWIN.md")
    args = p.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    if args.side == "report":
        return write_report(args)
    if args.side == "report-all":
        return write_report_all(args)

    if args.side == "torch":
        # keep the torch side's jax usage (target encode + shared decode)
        # off the TPU so a concurrently running flax side owns the tunnel
        import jax

        jax.config.update("jax_platforms", "cpu")

    print(f"generating {args.train_n}+{args.eval_n} images at "
          f"{args.size}^2 ...", flush=True)
    train_imgs, train_joints = make_split(args.seed, args.train_n, args.size)
    eval_imgs, eval_joints = make_split(args.seed + 1, args.eval_n, args.size)
    batches = batch_schedule(11, args.train_n, args.batch, args.steps)
    data = (train_imgs, train_joints, eval_imgs, eval_joints, batches)

    result = (run_torch_side if args.side == "torch" else run_flax_side)(
        args, data)
    result["args"] = {
        k: v for k, v in vars(args).items() if k not in ("side",)
    }
    fname = f"{args.side}.json"
    if args.side == "flax" and args.perturb:
        fname = f"flax_pert{args.perturb_seed}.json"
    elif args.side == "flax" and args.matmul_precision != "highest":
        fname = f"flax_{args.matmul_precision}.json"
    out = os.path.join(args.workdir, fname)
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    return out


if __name__ == "__main__":
    main()
