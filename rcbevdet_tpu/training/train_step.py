"""The jitted train step: single program, data-parallel over a mesh.

Replaces the reference's mmcv ``EpochBasedRunner`` + DDP +
``OptimizerHook`` (apis/train.py:181-326): one pure function
``train_step(state, batch) -> (state, metrics)`` jitted with GSPMD
shardings (params replicated, batch sharded over the 'data' axis) — XLA
inserts the gradient all-reduce over ICI; grad clip 5.0 and AdamW
(lr 1e-4, wd 1e-2) per the config (rcbevdet-...py:334-335); cyclic LR and
beta1 schedules; MEGVII-style EMA.

Freezing: the RC recipe trains radar+fusion+head on a frozen camera branch
(bevdet_rc.py:548-580).  We zero updates for frozen parameter subtrees via
an optax mask (the BN-stat freeze lives in the model's update_stats flags).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from ..models.centerpoint_head import centerpoint_loss, multi_task_loss
from ..models.view_transformer import depth_loss
from .ema import update_ema
from .schedules import cyclic_lr, cyclic_momentum

FROZEN_CAMERA_PREFIXES = (
    "camera",  # img_backbone/img_neck/img_view_transformer/pre_process
    "img_bev_encoder_backbone",
    "img_bev_encoder_neck",
)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    # EMA of BN running stats too: the reference ModelEMA averages every
    # floating entry of the state_dict including running_mean/var
    # (core/hook/ema.py:56-59), so evaluating EMA params must pair them
    # with EMA batch stats, not the raw ones.
    ema_batch_stats: Any
    step: jnp.ndarray
    ema_updates: jnp.ndarray


def frozen_mask(params, frozen_prefixes=FROZEN_CAMERA_PREFIXES):
    """Pytree of bools: True = trainable."""
    flat = flax.traverse_util.flatten_dict(params)
    mask = {
        k: not any(k[0] == p for p in frozen_prefixes) for k in flat
    }
    return flax.traverse_util.unflatten_dict(mask)


def make_optimizer(
    base_lr=1e-4,
    weight_decay=1e-2,
    total_steps=10000,
    grad_clip=5.0,
    freeze_img=True,
    params=None,
    layer_decay=None,
    layer_decay_num_layers=None,
    cumulative_iters=1,
):
    """``layer_decay``: ViT layer-wise LR decay rate (e.g. 0.9); scales
    the final update per image-backbone block like the reference's
    LearningRateDecayOptimizerConstructor param groups.

    ``cumulative_iters``: gradient accumulation — apply the (mean of the)
    accumulated gradients every k calls, identity updates in between.
    Counterpart of mmcv's GradientCumulativeOptimizerHook
    (apis/train.py:270-272; its loss/k scaling == optax.MultiSteps' mean),
    and the single-chip route to the reference's batch-8-per-GPU recipe
    on 16 GB HBM.  The cyclic LR/momentum schedules advance once per
    APPLY (MultiSteps holds inner state constant between applies), so
    pass ``total_steps`` in optimizer steps (train iters / k); the
    reference's iter-based LR hook differs by at most one micro-iter of
    schedule resolution at each apply."""
    lr_fn = cyclic_lr(base_lr, total_steps)
    b1_fn = cyclic_momentum(0.9, total_steps)
    parts = []
    if freeze_img and params is not None:
        # Zero frozen-subtree gradients BEFORE the global-norm clip: the
        # reference sets requires_grad=False on the camera branch
        # (bevdet_rc.py:548-580), so its clip norm covers only trainable
        # params.  Clipping the full (mostly frozen) gradient would trigger
        # earlier and systematically shrink the trainable updates.
        parts.append(optax.masked(optax.set_to_zero(), _inverted_mask(params)))
    parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(
        optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(
                learning_rate=learning_rate, b1=b1, weight_decay=weight_decay
            )
        )(learning_rate=lr_fn, b1=b1_fn)
    )
    if layer_decay is not None and params is not None:
        parts.append(
            scale_updates_by(
                layer_decay_factors(
                    params, layer_decay, layer_decay_num_layers
                )
            )
        )
    if freeze_img and params is not None:
        # ... and zero the final updates as well: adamw's decoupled weight
        # decay adds -lr*wd*param even where the gradient is zero.
        parts.append(optax.masked(optax.set_to_zero(), _inverted_mask(params)))
    tx = optax.chain(*parts)
    if cumulative_iters > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cumulative_iters)
    return tx


def layer_decay_factors(params, decay=0.9, num_layers=None,
                        backbone_key="camera"):
    """Per-leaf LR multipliers for ViT layer-wise decay.

    Counterpart of the reference's LearningRateDecayOptimizerConstructor +
    LrDecayControlHook (models/utils/layer_decay_optimizer_constructor.py,
    core/hook/lrdecaycontrol.py): backbone block i gets
    decay^(num_layers - i), the patch/pos embeddings get
    decay^(num_layers + 1), everything outside the image backbone gets 1.

    Layer ids are parsed from flax paths containing ``block{i}`` under the
    image backbone subtree.
    """
    import re as _re

    del backbone_key
    flat = flax.traverse_util.flatten_dict(params)
    ids = []
    for k in flat:
        if "img_backbone" not in k:
            continue
        for part in k:
            m = _re.fullmatch(r"block(\d+)", part)
            if m:
                ids.append(int(m.group(1)))
                break
    n = num_layers if num_layers is not None else (max(ids) + 1 if ids else 0)

    def factor(path):
        in_backbone = "img_backbone" in path
        if not in_backbone:
            return 1.0
        for part in path:
            m = _re.fullmatch(r"block(\d+)", part)
            if m:
                return decay ** (n - int(m.group(1)))
        # embeddings / stems sit below every block
        return decay ** (n + 1)

    return flax.traverse_util.unflatten_dict(
        {k: factor(k) for k in flat}
    )


def scale_updates_by(factors):
    """optax transform multiplying updates leafwise by a static pytree."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        return (
            jax.tree_util.tree_map(lambda u, f: u * f, updates, factors),
            state,
        )

    return optax.GradientTransformation(init, update)


def _inverted_mask(params):
    """True where parameters are FROZEN (for set_to_zero masking)."""
    m = frozen_mask(params)
    return jax.tree_util.tree_map(lambda t: not t, m)


def create_train_state(model, variables, tx):
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=stats,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params),
        ema_batch_stats=jax.tree_util.tree_map(jnp.array, stats),
        step=jnp.zeros((), jnp.int32),
        ema_updates=jnp.asarray(10560, jnp.int32),  # init_updates (config :353)
    )


def make_train_step(
    model,
    tx,
    cfg,
    loss_depth_weight=3.0,
    with_prev=True,
    donate=True,
):
    """Build the jittable train step for an RCBEVDet-style model."""

    def loss_fn(params, batch_stats, batch, step):
        # per-step deterministic dropout rng (the reference's ASPP
        # dropout(0.5) is active during training, view_transformer.py:405)
        outputs, updates = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch, train=True, with_prev=with_prev, mutable=["batch_stats"],
            rngs={"dropout": jax.random.fold_in(
                jax.random.PRNGKey(0x5EED), step)},
        )
        preds, depth = outputs[0], outputs[1]
        losses = centerpoint_loss(
            preds, batch["heatmap_t"], batch["anno_box_t"],
            batch["inds_t"], batch["mask_t"],
        )
        if "gt_depth" in batch:
            # cast: under train_camera_dtype the predicted depth arrives
            # bf16; the BCE's log/clip must run f32 like the reference
            losses["loss_depth"] = depth_loss(
                batch["gt_depth"], depth.astype(jnp.float32),
                cfg.downsample,
                cfg.grid_config["depth"], weight=loss_depth_weight,
            )
        if len(outputs) > 2:
            # HoP auxiliary losses at the reference's 0.5x weights
            # (det-...-withHoP-...py:216-217: cls 1.0*0.5, bbox 0.25*0.5)
            aux_preds = outputs[2]
            if isinstance(aux_preds, (list, tuple)):
                # 6-task MultiTaskCenterHead (det-...-withHoP-...py:194-200)
                if "aux0_heatmap_t" in batch:
                    task_targets = [
                        (
                            batch[f"aux{t}_heatmap_t"],
                            batch[f"aux{t}_anno_box_t"],
                            batch[f"aux{t}_inds_t"],
                            batch[f"aux{t}_mask_t"],
                        )
                        for t in range(len(aux_preds))
                    ]
                    aux = multi_task_loss(
                        aux_preds, task_targets,
                        cls_weight=0.5, bbox_weight=0.125,
                    )
                    losses.update({f"aux_{k}": v for k, v in aux.items()})
            elif "aux_heatmap_t" in batch:
                aux = centerpoint_loss(
                    aux_preds, batch["aux_heatmap_t"],
                    batch["aux_anno_box_t"], batch["aux_inds_t"],
                    batch["aux_mask_t"], cls_weight=0.5, bbox_weight=0.125,
                )
                losses.update({f"aux_{k}": v for k, v in aux.items()})
        if getattr(cfg, "with_seg", False) and "gt_masks_bev" in batch:
            # seg logits are appended last by RCBEVDet.__call__ when
            # cfg.with_seg (reference pts_seg_head loss, bevdet_rc.py:473)
            from ..models.seg_head import seg_loss as _seg_loss

            losses["loss_seg"] = _seg_loss(
                outputs[-1], batch["gt_masks_bev"], loss_type="focal"
            )
        total = sum(losses.values())
        return total, (losses, updates["batch_stats"])

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        if getattr(cfg, "freeze_img", False):
            # differentiate ONLY the trainable subtree: requesting grads
            # for frozen params forces XLA to build the whole camera-branch
            # backward (then optax zeroes it) — treating them as constants
            # lets it be DCE'd, the analog of the reference's
            # requires_grad=False (bevdet_rc.py:551-568)
            flat = flax.traverse_util.flatten_dict(state.params)
            train_flat = {
                k: v for k, v in flat.items()
                if not any(k[0] == p for p in FROZEN_CAMERA_PREFIXES)
            }
            frozen_flat = {
                k: v for k, v in flat.items() if k not in train_flat
            }
            cam_dtype = getattr(cfg, "train_camera_dtype", None)
            if cam_dtype is not None:
                # frozen-camera fast path (ROADMAP r5 lever 2): the frozen
                # branch is inference-like (no grads, batch-stat BN with
                # f32 accumulation), so its ~60 ms of f32 conv can run in
                # bf16.  Cast the frozen CONSTANTS only — f32 masters,
                # trainable params, BN stats, losses stay f32; activations
                # re-promote to f32 at the first trainable op (CAMF).
                cdt = jnp.dtype(cam_dtype)
                frozen_flat = {
                    k: v.astype(cdt) if v.dtype == jnp.float32 else v
                    for k, v in frozen_flat.items()
                }
                batch = dict(
                    batch, imgs=batch["imgs"].astype(cdt)
                )

            def loss_fn_split(tf, batch_stats, batch, step):
                params = flax.traverse_util.unflatten_dict(
                    {**tf, **frozen_flat}
                )
                return loss_fn(params, batch_stats, batch, step)

            grad_fn = jax.value_and_grad(loss_fn_split, has_aux=True)
            (total, (losses, new_stats)), g_train = grad_fn(
                train_flat, state.batch_stats, batch, state.step
            )
            grads = flax.traverse_util.unflatten_dict(
                {
                    **g_train,
                    # zeros in the MASTER dtype (frozen_flat may be bf16
                    # under train_camera_dtype; optimizer state is f32)
                    **{k: jnp.zeros_like(flat[k]) for k in frozen_flat},
                }
            )
        else:
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (total, (losses, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, state.step
            )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        n_updates = state.ema_updates + 1  # reference increments first
        new_ema = update_ema(state.ema_params, new_params, n_updates)
        new_ema_stats = update_ema(
            state.ema_batch_stats, new_stats, n_updates
        )
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
            ema_batch_stats=new_ema_stats,
            step=state.step + 1,
            ema_updates=n_updates,
        )
        metrics = dict(losses)
        metrics["loss"] = total
        if getattr(cfg, "freeze_img", False):
            # report the trainable-subtree norm (what the clip sees), like
            # the reference whose frozen branch has requires_grad=False
            mask = frozen_mask(state.params)
            metrics["grad_norm"] = optax.global_norm(
                jax.tree_util.tree_map(
                    lambda g, m: g if m else jnp.zeros_like(g), grads, mask
                )
            )
        else:
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step
