"""Trained-MODEL equivalence vs the reference (torch, CPU).

The strongest "same trained model" evidence obtainable without real
datasets on disk: start the reference torch model and the Flax rebuild
from the SAME weights, train BOTH for hundreds of optimizer steps on the SAME
learnable synthetic localization task (identical images, targets, batch
order, and Adam schedule), then evaluate BOTH trained models through the
same batched DARK decoder and require equal PCK@0.2 / AUC / EPE.

This is deliberately different from tests/test_train_dynamics_parity.py
(5 linear-regime steps with per-leaf state diffs): here the horizon is
long enough that train-mode BatchNorm chaos fully decorrelates the weight
trajectories, so weight-level comparison is meaningless — the assertion
is the north-star claim itself (BASELINE.json "PCK parity"): both
frameworks learn EQUALLY GOOD models from the same data, initialization,
and optimizer. Reference lifecycle being matched: dist_train.py:50-289
(train) + test.py:63-155 (checkpoint eval -> PCK/AUC/EPE), run here on a
synthetic stand-in for FreiHAND.

The task: 21 Gaussian colour markers (well-separated RGB-cube colours,
one per joint) splatted on low-amplitude noise over 8 training images —
the convergence-e2e scale, where 250 steps memorize to PCK ≈ 1 (measured:
the flax side hits trainPCK 0.99 / EPE 2.7px at step 200). The primary
metric is TRAIN-set accuracy (memorization quality of the trained model);
a 32-image held-out split is also compared, loosely — at 8 training
images generalization saturates low (~0.3) and is chaos-sensitive across
frameworks, so only gross divergence is asserted there.

Scope: litehandnet + mynet + hourglass + srhandnet + mynet-simdr +
litehrnet — one case per structurally distinct training computation
(single heatmap criterion, stacked intermediate supervision, 4-scale
region loss, SimDR supervision with criterion-owned trainable decoders)
plus the most structurally distinct backbone (litehrnet's multi-branch
cross-resolution weighting), width/depth reduced identically on both
sides where the family allows it, keeping each twin run under ~10 min
CPU. Remaining family breadth is covered by the 10-family battery in
test_train_dynamics_parity.py; resnet18 was measured to memorize this
task 4x slower, making its twin run CI-prohibitive.
"""

import itertools

import numpy as np
import pytest

from tests import ref_loader
from tests.test_forward_parity import sane_reinit
from tests.test_train_dynamics_parity import _neutralize_dropout

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not ref_loader.reference_available(), reason="reference checkout absent"
)

SIZE, HM, K = 64, 16, 21
N_TRAIN, N_EVAL, BATCH = 8, 32, 8
LR = 2e-3
# width/depth reduced identically on BOTH sides: the equivalence claim is
# about the training computation, not the config's width (convergence-e2e
# scale). Steps chosen to saturate train-set PCK near 1.0 (measured:
# litehandnet 0.99 at step 200; mynet 0.91 at 250-step pace, so 350)
HG_OVERRIDES = dict(input_channel=32, num_stage=3, num_block=[1, 1])
# (refcfg_path, family, steps, model overrides, training-path mode)
# mode: "heatmap" single-map criterion | "stacked" [B,S,...] intermediate
# supervision | "srhandnet" 4-scale multi-resolution region loss |
# "simdr" heatmap + SimDR loss with criterion-owned linear decoders.
# Together the four modes cover every structurally distinct heatmap
# training computation in the reference; atthandnet's coordinate
# regression is excluded only because the reference model is size-locked
# to 224 inputs (its AugmentedConv reshape quirk), making a CPU twin run
# prohibitive — its training path is covered at 224 by
# test_train_dynamics_parity.py.
CASES = [
    pytest.param(
        "config/litehandnet/_2_freihand_224x244_dark_h4_ca_none.py",
        "litehandnet", 250, HG_OVERRIDES, "heatmap", marks=pytest.mark.slow,
    ),
    pytest.param(
        "config/mynet/_2_freihand2d_224x224_dark.py",
        "mynet", 350, HG_OVERRIDES, "heatmap", marks=pytest.mark.slow,
    ),
    # stacked-hourglass lineage: intermediate supervision on every stack,
    # stacked [B, S, ...] targets, decode from the LAST stack (reference
    # test.py uses the final output; loss/loss.py broadcasts over stacks)
    pytest.param(
        "config/hourglass/_2_freihand2d_224x224_dark_h2.py",
        "hourglass", 250,
        dict(num_stack=2, num_level=2, input_channel=64), "stacked",
        marks=pytest.mark.slow,
    ),
    # SRHandNet: fixed-width (no reduction knobs exist), 4 outputs at 3
    # resolutions, 22-channel point + 2-channel wh split loss
    # (loss/loss.py:41-57), decode from outputs[-1][:, :21] (test.py:117)
    pytest.param(
        "config/srhandnet/_1_freihand2d_224x224_region.py",
        "srhandnet", 200, {}, "srhandnet", marks=pytest.mark.slow,
    ),
    # SimDR supervision: the criterion OWNS trainable linear decoders
    # (loss/centernet_simdr_loss.py:42-69); both frameworks optimize
    # model + criterion params jointly for the whole horizon
    # (optimizer_scheduler.py:8-10) and are scored through BOTH decode
    # paths (heatmap DARK + the trained SimDR decoders)
    pytest.param(
        "config/mynet/_4_freihand2d_224x224_dark_simdr.py",
        "mynet", 350, HG_OVERRIDES, "simdr", marks=pytest.mark.slow,
    ),
    # Lite-HRNet: multi-branch cross-resolution weighting + IterativeHead
    # (the most structurally distinct backbone); the reference hard-codes
    # its widths (lite_hrnet.py:294-307), so the twin runs full-width at
    # the reduced 64^2 input (~1 s/step torch CPU)
    pytest.param(
        "config/litehrnet/_2_freihand_224x244_dark_18.py",
        "litehrnet", 250, {}, "heatmap", marks=pytest.mark.slow,
    ),
]


def _marker_colors():
    """21 well-separated RGB-cube colours (dark corners dropped — the
    background is dark noise). Hue-wheel colours were measured too
    confusable: adjacent hues ~17 degrees apart cap PCK at ~0.5."""
    grid = [np.array(c, np.float32)
            for c in itertools.product((0.0, 0.5, 1.0), repeat=3)]
    return np.stack([c for c in grid if c.sum() >= 1.0][:K])


def _make_split(rng, n):
    colors = _marker_colors()
    yy, xx = np.mgrid[:SIZE, :SIZE].astype(np.float32)
    joints = rng.uniform(8, SIZE - 8, size=(n, K, 2)).astype(np.float32)
    imgs = np.empty((n, SIZE, SIZE, 3), np.float32)
    for i in range(n):
        img = rng.uniform(0, 0.25, (SIZE, SIZE, 3)).astype(np.float32)
        for k in range(K):
            x, y = joints[i, k]
            blob = np.exp(-((xx - x) ** 2 + (yy - y) ** 2) / (2 * 2.0**2))
            img += blob[..., None] * colors[k]
        imgs[i] = np.clip(img, 0.0, 1.0)
    return imgs * 2.0 - 1.0, joints


def _heatmap_targets(joints):
    from litehandnet_tpu.ops.encode import msra_heatmaps

    return np.stack([
        np.asarray(msra_heatmaps(
            j, np.ones(K), (SIZE, SIZE), (HM, HM), 1.5, unbiased=True
        )[0]) for j in joints
    ])  # [N, HM, HM, K]


def _srhandnet_targets(joints, out_hw):
    """Per-scale SRHandNet targets: 21 kpt gaussians + the region-map
    triple (center gaussian, 5x5 w/h-ratio patches around the center
    cell) — the layout SRHandNetGenerateTarget paints
    (generateTarget.py:321-366). Center/size are derived from the joint
    cloud, so both region channels are learnable from the image."""
    from litehandnet_tpu.ops.encode import msra_heatmaps

    n = joints.shape[0]
    centers = joints.mean(axis=1, keepdims=True)           # [N, 1, 2] px
    wh = ((joints.max(1) - joints.min(1)) / SIZE).astype(np.float32)
    outs = []
    for h, w in out_hw:
        kpt = np.stack([np.asarray(msra_heatmaps(
            j, np.ones(K), (SIZE, SIZE), (h, w), 1.5, unbiased=True
        )[0]) for j in joints])                            # [N, h, w, K]
        cen = np.stack([np.asarray(msra_heatmaps(
            c, np.ones(1), (SIZE, SIZE), (h, w), 1.5, unbiased=True
        )[0]) for c in centers])                           # [N, h, w, 1]
        whmap = np.zeros((n, h, w, 2), np.float32)
        cx = np.clip((centers[:, 0, 0] * w / SIZE).astype(int), 0, w - 1)
        cy = np.clip((centers[:, 0, 1] * h / SIZE).astype(int), 0, h - 1)
        for i in range(n):
            whmap[i, max(cy[i] - 2, 0):cy[i] + 3,
                  max(cx[i] - 2, 0):cx[i] + 3] = wh[i]
        outs.append(np.concatenate([kpt, cen, whmap], -1).astype(np.float32))
    return outs


def _decode_and_score(hm_nhwc, joints):
    """Shared decode path for both frameworks: batched DARK + unwarp, then
    PCK@0.2 / AUC / EPE exactly as the reference's _report_metric
    (base_dataset.py:193-261) computes them for FreiHAND."""
    import jax.numpy as jnp

    from litehandnet_tpu.eval.metrics import (
        keypoint_auc, keypoint_epe, keypoint_pck_accuracy,
    )
    from litehandnet_tpu.ops.decode import keypoints_from_heatmaps

    n = hm_nhwc.shape[0]
    center = np.tile([[SIZE / 2.0, SIZE / 2.0]], (n, 1)).astype(np.float32)
    scale = np.tile([[SIZE / 200.0, SIZE / 200.0]], (n, 1)).astype(np.float32)
    _, preds, _ = keypoints_from_heatmaps(
        jnp.asarray(hm_nhwc), jnp.asarray(center), jnp.asarray(scale),
        post_process="unbiased", kernel=11,
    )
    preds = np.asarray(preds)
    mask = np.ones((n, K), bool)
    norm = np.tile([[SIZE, SIZE]], (n, 1)).astype(np.float32)
    _, pck, _ = keypoint_pck_accuracy(preds, joints, mask, 0.2, norm)
    auc = keypoint_auc(preds, joints, mask, float(SIZE), num_step=20)
    epe = keypoint_epe(preds, joints, mask)
    return float(pck), float(auc), float(epe)


@pytest.mark.parametrize("refcfg_path,family,steps,overrides,mode",
                         CASES)
def test_trained_model_equivalence(refcfg_path, family, steps, overrides,
                                   mode, rng, monkeypatch):
    import jax
    import jax.numpy as jnp
    import optax

    from litehandnet_tpu.config import config_from_dict
    from litehandnet_tpu.losses import get_loss
    from litehandnet_tpu.models import get_model
    from litehandnet_tpu.utils.torch_import import import_torch_state_dict

    refcfg = ref_loader.load_ref_config(refcfg_path)
    refcfg.DATASET.image_size = [SIZE, SIZE]
    refcfg.DATASET.heatmap_size = [HM, HM]
    for key, val in overrides.items():
        refcfg.MODEL[key] = val
    tm = ref_loader.build_ref_model(refcfg)
    sane_reinit(tm)
    # dropout randomness cannot be synchronized across frameworks;
    # neutralized identically on both sides (p=0 keeps scale at exactly 1)
    _neutralize_dropout(tm, monkeypatch)
    ref_loader.ensure_reference_importable()
    import importlib

    ref_criterion = importlib.import_module("loss").get_loss(refcfg)

    cfg = config_from_dict(dict(refcfg))
    model = get_model(cfg)
    target_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False
    )
    variables = import_torch_state_dict(family, tm.state_dict(), target_vars)
    criterion = get_loss(cfg)
    n_stack = int(refcfg.MODEL.get("num_stack", 1)) if mode == "stacked" else 0
    if mode == "srhandnet":
        with torch.no_grad():
            probe = tm(torch.zeros(1, 3, SIZE, SIZE))
        out_hw = [tuple(o.shape[2:]) for o in probe]
        zero_out = [jnp.zeros((BATCH, h, w, 24)) for h, w in out_hw]
        crit_vars = criterion.init(
            jax.random.PRNGKey(1), zero_out,
            {"target": zero_out,
             "target_weight": [jnp.ones((BATCH, 24))] * len(out_hw)},
        )
    else:
        out_shape = (
            (BATCH, n_stack, HM, HM, K) if mode == "stacked"
            else (BATCH, HM, HM, K)
        )
        init_batch = {"target": jnp.zeros(out_shape),
                      "target_weight": jnp.ones((BATCH, K))}
        if mode == "simdr":
            k_ratio = int(cfg.PIPELINE.simdr_split_ratio)
            init_batch["simdr_x"] = jnp.zeros((BATCH, K, SIZE * k_ratio))
            init_batch["simdr_y"] = jnp.zeros((BATCH, K, SIZE * k_ratio))
        crit_vars = criterion.init(
            jax.random.PRNGKey(1), jnp.zeros(out_shape), init_batch,
        )
    crit_params = dict(crit_vars.get("params", {}))
    if mode == "simdr":
        # start both frameworks from the SAME criterion decoders (deep
        # copy — the torch side trains in place before the flax side runs)
        from tests.test_train_dynamics_parity import _simdr_crit_to_flax

        crit_params = _simdr_crit_to_flax(ref_criterion, crit_params)
    else:
        assert not crit_params, "heatmap criterion owns no params"

    # --- identical data + batch schedule for both frameworks -------------
    train_imgs, train_joints = _make_split(rng, N_TRAIN)
    eval_imgs, eval_joints = _make_split(rng, N_EVAL)
    if mode == "srhandnet":
        train_tgts_ms = _srhandnet_targets(train_joints, out_hw)
        weights = np.ones((N_TRAIN, 24), np.float32)
    else:
        train_tgts = _heatmap_targets(train_joints)
        weights = np.ones((N_TRAIN, K), np.float32)
    if mode == "simdr":
        from litehandnet_tpu.ops.encode import simdr_targets

        k_ratio = int(cfg.PIPELINE.simdr_split_ratio)
        sx, sy = zip(*[
            simdr_targets(j, np.ones(K), (SIZE, SIZE), k_ratio, 2.0)
            for j in train_joints
        ])
        train_sx = np.stack([np.asarray(v) for v in sx])  # [N, K, SIZE*k]
        train_sy = np.stack([np.asarray(v) for v in sy])

    order_rng = np.random.RandomState(11)
    batches = []
    while len(batches) < steps:
        perm = order_rng.permutation(N_TRAIN)
        batches += [perm[j:j + BATCH] for j in range(0, N_TRAIN, BATCH)]
    batches = batches[:steps]

    # --- torch side: reference model + criterion + Adam ------------------
    tm.train()
    ref_criterion.train()
    # criterion params join the optimizer (reference
    # optimizer_scheduler.py:8-10 appends them for simdr/auto_weight)
    opt = torch.optim.Adam(
        list(tm.parameters()) + list(ref_criterion.parameters()), lr=LR
    )
    t_losses = []
    for idx in batches:
        x = torch.from_numpy(train_imgs[idx].transpose(0, 3, 1, 2))
        if mode == "stacked":
            t = np.tile(
                train_tgts[idx][:, None], (1, n_stack, 1, 1, 1)
            )  # [b, S, HM, HM, K]
            meta = {
                "target": torch.from_numpy(t.transpose(0, 1, 4, 2, 3)),
                "target_weight": torch.from_numpy(np.tile(
                    weights[idx][:, None, :, None], (1, n_stack, 1, 1)
                )),
            }
        elif mode == "srhandnet":
            meta = {
                "target": [
                    torch.from_numpy(t[idx].transpose(0, 3, 1, 2))
                    for t in train_tgts_ms
                ],
                "target_weight": [
                    torch.from_numpy(weights[idx][..., None])
                ] * len(out_hw),
            }
        else:
            meta = {
                "target": torch.from_numpy(
                    train_tgts[idx].transpose(0, 3, 1, 2)
                ),
                "target_weight": torch.from_numpy(weights[idx][..., None]),
            }
            if mode == "simdr":
                meta["simdr_x"] = torch.from_numpy(train_sx[idx])
                meta["simdr_y"] = torch.from_numpy(train_sy[idx])
        loss, _ = ref_criterion(tm(x), meta)
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_losses.append(float(loss.detach()))

    tm.eval()
    with torch.no_grad():
        t_hm_tr = tm(torch.from_numpy(train_imgs.transpose(0, 3, 1, 2)))
        t_hm_ev = tm(torch.from_numpy(eval_imgs.transpose(0, 3, 1, 2)))
    if mode == "stacked":  # [B, S, K, H, W] -> last stack
        t_hm_tr, t_hm_ev = t_hm_tr[:, -1], t_hm_ev[:, -1]
    elif mode == "srhandnet":  # last scale, kpt channels (test.py:117)
        t_hm_tr, t_hm_ev = t_hm_tr[-1][:, :K], t_hm_ev[-1][:, :K]
    t_hm_tr = np.asarray(t_hm_tr).transpose(0, 2, 3, 1)
    t_hm_ev = np.asarray(t_hm_ev).transpose(0, 2, 3, 1)

    # --- flax side: same init, same batches, optax Adam -------------------
    # model and criterion params train jointly (criterion params are empty
    # except for the SimDR decoders), mirroring the torch optimizer above
    trainable = {"model": variables["params"], "crit": crit_params}
    stats = variables["batch_stats"]
    tx = optax.adam(LR)
    opt_state = tx.init(trainable)

    @jax.jit
    def step(trainable, stats, opt_state, x, batch):
        def loss_fn(tr):
            out, mutated = model.apply(
                {"params": tr["model"], "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            loss, _ = criterion.apply({"params": tr["crit"]}, out, batch)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(trainable)
        updates, new_opt = tx.update(grads, opt_state, trainable)
        return (
            optax.apply_updates(trainable, updates), new_stats, new_opt, loss
        )

    f_losses = []
    for idx in batches:
        if mode == "srhandnet":
            batch = {
                "target": [jnp.asarray(t[idx]) for t in train_tgts_ms],
                "target_weight": [jnp.asarray(weights[idx])] * len(out_hw),
            }
        else:
            tgt = train_tgts[idx]
            if mode == "stacked":
                tgt = np.tile(tgt[:, None], (1, n_stack, 1, 1, 1))
            batch = {"target": jnp.asarray(tgt),
                     "target_weight": jnp.asarray(weights[idx])}
            if mode == "simdr":
                batch["simdr_x"] = jnp.asarray(train_sx[idx])
                batch["simdr_y"] = jnp.asarray(train_sy[idx])
        trainable, stats, opt_state, loss = step(
            trainable, stats, opt_state, jnp.asarray(train_imgs[idx]), batch,
        )
        f_losses.append(float(loss))
    params = trainable["model"]

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    fv = {"params": params, "batch_stats": stats}
    f_hm_tr = fwd(fv, jnp.asarray(train_imgs))
    f_hm_ev = fwd(fv, jnp.asarray(eval_imgs))
    if mode == "stacked":  # [B, S, H, W, K] -> last stack
        f_hm_tr, f_hm_ev = f_hm_tr[:, -1], f_hm_ev[:, -1]
    elif mode == "srhandnet":  # last scale, kpt channels
        f_hm_tr, f_hm_ev = f_hm_tr[-1][..., :K], f_hm_ev[-1][..., :K]
    f_hm_tr, f_hm_ev = np.asarray(f_hm_tr), np.asarray(f_hm_ev)

    # --- evaluation through ONE shared decode ----------------------------
    t_pck, t_auc, t_epe = _decode_and_score(t_hm_tr, train_joints)
    f_pck, f_auc, f_epe = _decode_and_score(f_hm_tr, train_joints)
    t_epck, _, t_eepe = _decode_and_score(t_hm_ev, eval_joints)
    f_epck, _, f_eepe = _decode_and_score(f_hm_ev, eval_joints)

    if mode == "simdr":
        # second decode path: each framework's TRAINED criterion decoders
        # project the eval-mode heatmaps to 1-D vectors, decoded by the
        # shared SimDR decoder (top_down_eval.py:466-500 semantics)
        from litehandnet_tpu.eval.metrics import keypoint_pck_accuracy
        from litehandnet_tpu.ops.decode import keypoints_from_simdr

        def simdr_pck(hm_nhwc, wx, bx, wy, by, joints):
            B = hm_nhwc.shape[0]
            flat = hm_nhwc.transpose(0, 3, 1, 2).reshape(B, K, HM * HM)
            px, py = flat @ wx + bx, flat @ wy + by
            center = np.tile(
                [[SIZE / 2.0, SIZE / 2.0]], (B, 1)).astype(np.float32)
            scale = np.tile(
                [[SIZE / 200.0, SIZE / 200.0]], (B, 1)).astype(np.float32)
            out = keypoints_from_simdr(
                jnp.asarray(px), jnp.asarray(py), jnp.asarray(center),
                jnp.asarray(scale), k_ratio,
            )
            preds = np.asarray(out)[..., :2]
            _, pck, _ = keypoint_pck_accuracy(
                preds, joints, np.ones((B, K), bool), 0.2,
                np.tile([[SIZE, SIZE]], (B, 1)).astype(np.float32),
            )
            return float(pck)

        sd = ref_criterion.state_dict()
        t_spck = simdr_pck(
            t_hm_tr,
            np.asarray(sd["simdr_loss.x_shared_decoder.weight"]).T,
            np.asarray(sd["simdr_loss.x_shared_decoder.bias"]),
            np.asarray(sd["simdr_loss.y_shared_decoder.weight"]).T,
            np.asarray(sd["simdr_loss.y_shared_decoder.bias"]),
            train_joints,
        )
        fc = trainable["crit"]["simdr"]
        f_spck = simdr_pck(
            f_hm_tr,
            np.asarray(fc["x_decoder"]["kernel"]),
            np.asarray(fc["x_decoder"]["bias"]),
            np.asarray(fc["y_decoder"]["kernel"]),
            np.asarray(fc["y_decoder"]["bias"]),
            train_joints,
        )
        print(f"\nTRAINED-EQUIVALENCE mynet-simdr decoder path: "
              f"train-set simdr-PCK torch={t_spck:.4f} flax={f_spck:.4f}")
        assert t_spck >= 0.90 and f_spck >= 0.90, (t_spck, f_spck)
        assert abs(t_spck - f_spck) <= 0.05, (t_spck, f_spck)

    # committed-evidence hook: printed so full-suite logs (TESTS_rN.txt,
    # run with -rA) record the measured numbers per round
    print(
        f"\nTRAINED-EQUIVALENCE {family} {steps} steps | train-set: "
        f"torch PCK={t_pck:.4f} AUC={t_auc:.4f} EPE={t_epe:.3f}px / "
        f"flax PCK={f_pck:.4f} AUC={f_auc:.4f} EPE={f_epe:.3f}px | "
        f"held-out PCK: torch={t_epck:.3f} flax={f_epck:.3f} | "
        f"tail loss: torch={np.mean(t_losses[-10:]):.5f} "
        f"flax={np.mean(f_losses[-10:]):.5f}"
    )

    # step-0 loss identical (transferred weights); both trajectories
    # descended by >5x (non-vacuous training); converged to same-quality
    # minima (weight paths are chaotic; the loss LEVEL is the invariant)
    assert f_losses[0] == pytest.approx(t_losses[0], rel=2e-4)
    t_tail = float(np.mean(t_losses[-10:]))
    f_tail = float(np.mean(f_losses[-10:]))
    assert t_tail < 0.2 * t_losses[0]
    assert f_tail < 0.2 * f_losses[0]
    assert abs(t_tail - f_tail) <= 0.3 * max(t_tail, f_tail), (t_tail, f_tail)

    # the north-star claim: the two trained models are equally good.
    # train-set metrics are the tight check (memorization quality);
    # held-out only gates gross divergence (8 training images generalize
    # ~0.3 PCK and the residual is chaos-dominated)
    assert t_pck >= 0.90 and f_pck >= 0.90, (t_pck, f_pck)
    assert abs(t_pck - f_pck) <= 0.05, (t_pck, f_pck)
    assert abs(t_auc - f_auc) <= 0.04, (t_auc, f_auc)
    assert t_epe <= 4.5 and f_epe <= 4.5, (t_epe, f_epe)
    assert abs(t_epe - f_epe) <= 1.5, (t_epe, f_epe)
    assert abs(t_epck - f_epck) <= 0.15, (t_epck, f_epck)
