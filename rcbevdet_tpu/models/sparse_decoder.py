"""SparseBEV-style sparse-query decoder (RCBEVDet++ surface).

The reference repo ships only the CUDA sampling op for its RCBEVDet++
sparse decoder (mmdet3d/ops/csrc/msmv_sampling.cpp — our
ops/msmv_sampling.py) — the decoder itself is "code not in repo"
(README val table note).  This module provides the TPU-native decoder the
op exists for, following the published SparseBEV formulation the op's
call signature encodes (per-query pillar boxes, P adaptive sample points
projected to N cameras, per-level scale weights, adaptive mixing):

- query set: Q pillar boxes (x, y, z, w, l, h, yaw, vx, vy) + features.
- per layer: scale-adaptive self attention (attention biased by
  -tau * pairwise BEV center distance, per-head learned tau), adaptive
  sampling (offsets in the query-box frame -> ego -> image planes ->
  ``msmv_sampling`` over the multi-view pyramid), MLP-Mixer-style
  adaptive channel+point mixing, FFN, and an iterative box refinement.
- DETR-style set prediction training: one-to-one matching by a pure-JAX
  Bertsekas auction (the TPU backend does not support host callbacks, so
  scipy's linear_sum_assignment is not an option inside jit; the auction
  is fully vectorized, eps-optimal, and runs on device), focal
  classification + L1 box regression.

Everything is static-shape: GT is padded to max_objs with a mask, and
matching costs for padded rows are +inf-masked.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.msmv_sampling import msmv_sampling


def _auction_single(cost: jnp.ndarray, valid: jnp.ndarray,
                    n_iters: int, eps_frac: float) -> jnp.ndarray:
    """Bertsekas auction for one sample: cost [Q, M], valid [M] bool ->
    assign [M] query index (-1 for invalid GT).

    Valid GTs (bidders) compete for queries (items).  Jacobi rounds: every
    unassigned bidder bids best-minus-second-best + eps on its best item;
    each item goes to its highest bidder, dispossessing the previous owner.
    eps-complementary slackness bounds the total cost within M*eps of the
    optimum; a sequential greedy pass completes any bidders left when the
    iteration budget runs out (rare — auction typically converges in a few
    M rounds).
    """
    q_n, m_n = cost.shape
    value = -cost  # [Q, M] value of item q to bidder m
    span = jnp.maximum(jnp.max(cost) - jnp.min(cost), 1e-6)
    eps = span * eps_frac / (m_n + 1)
    marange = jnp.arange(m_n)

    def cond(state):
        assign, _, it = state
        return ((assign < 0) & valid).any() & (it < n_iters)

    def body(state):
        assign, price, it = state
        unassigned = (assign < 0) & valid  # [M]
        net = value - price[:, None]  # [Q, M]
        best_q = jnp.argmax(net, axis=0)  # [M]
        best_v = jnp.max(net, axis=0)
        net2 = net.at[best_q, marange].set(-jnp.inf)
        second_v = jnp.max(net2, axis=0)
        second_v = jnp.where(jnp.isfinite(second_v), second_v, best_v - 1.0)
        bid = price[best_q] + (best_v - second_v) + eps  # [M]
        bid = jnp.where(unassigned, bid, -jnp.inf)
        # resolve: per item, the winner is the highest bidder targeting it
        bids_mat = jnp.where(
            best_q[None, :] == jnp.arange(q_n)[:, None], bid[None, :],
            -jnp.inf,
        )  # [Q, M]
        win_bid = jnp.max(bids_mat, axis=1)  # [Q]
        win_bidder = jnp.argmax(bids_mat, axis=1)  # [Q]
        has_bid = jnp.isfinite(win_bid)
        # previous owners of re-sold items lose their assignment
        resold = jnp.where(assign >= 0,
                           has_bid[jnp.maximum(assign, 0)], False)
        assign = jnp.where(resold, -1, assign)
        # winners take their items
        assign = assign.at[
            jnp.where(has_bid, win_bidder, m_n)
        ].set(jnp.arange(q_n), mode="drop")
        price = jnp.where(has_bid, win_bid, price)
        return assign, price, it + 1

    assign0 = jnp.where(valid, -1, -1).astype(jnp.int32)
    assign, _, _ = jax.lax.while_loop(
        cond, body,
        (assign0, jnp.zeros((q_n,), cost.dtype), jnp.asarray(0)),
    )

    # greedy completion for any bidders the budget left unassigned
    owned = jnp.zeros((q_n,), bool).at[
        jnp.where(assign >= 0, assign, q_n)
    ].set(True, mode="drop")

    def greedy(m, state):
        assign, owned = state
        need = (assign[m] < 0) & valid[m]
        qb = jnp.argmax(jnp.where(owned, -jnp.inf, value[:, m]))
        assign = assign.at[m].set(jnp.where(need, qb, assign[m]))
        owned = owned.at[qb].set(owned[qb] | need)
        return assign, owned

    assign, _ = jax.lax.fori_loop(0, m_n, greedy, (assign, owned))
    return jnp.where(valid, assign, -1)


def hungarian_match(cost: jnp.ndarray, gt_mask: jnp.ndarray,
                    n_iters: int = 256,
                    eps_frac: float = 0.01) -> jnp.ndarray:
    """One-to-one assignment: [B, Q, M] cost -> [B, M] query index per GT
    (-1 for padded GT).  Pure-JAX device-side auction — no host callback
    (the TPU plugin rejects pure_callback), eps-optimal within
    ``eps_frac * cost-range`` of the Hungarian optimum."""
    return jax.vmap(
        lambda c, m: _auction_single(c, m > 0.5, n_iters, eps_frac)
    )(cost, gt_mask)


class AdaptiveMixing(nn.Module):
    """SparseBEV adaptive mixing: per-query dynamic channel + point mixing
    of the [P, C] sampled feature set."""

    dim: int
    num_points: int

    @nn.compact
    def __call__(self, query, sampled):
        """query [B, Q, C]; sampled [B, Q, P, C] -> [B, Q, C]."""
        b, q, p, c = sampled.shape
        # dynamic weights generated from the query
        ch_w = nn.Dense(c * c, name="channel_mix_gen")(query)
        ch_w = ch_w.reshape(b, q, c, c)
        pt_w = nn.Dense(p * p, name="point_mix_gen")(query)
        pt_w = pt_w.reshape(b, q, p, p)
        x = jnp.einsum("bqpc,bqcd->bqpd", sampled, ch_w)
        x = nn.LayerNorm(name="ln_ch")(nn.relu(x))
        x = jnp.einsum("bqpc,bqop->bqoc", x, pt_w)
        x = nn.LayerNorm(name="ln_pt")(nn.relu(x))
        x = x.reshape(b, q, p * c)
        out = nn.Dense(self.dim, name="out_proj")(x)
        return nn.LayerNorm(name="ln_out")(query + out)


class SparseBEVDecoderLayer(nn.Module):
    dim: int
    num_heads: int = 8
    num_points: int = 8
    num_levels: int = 4

    @nn.compact
    def __call__(self, query_feat, query_box, mlvl_feats, img_meta,
                 train=False):
        """query_feat [B, Q, C]; query_box [B, Q, 9];
        mlvl_feats: per-level [B, N, H_l, W_l, C]."""
        b, q, c = query_feat.shape

        # ---- scale-adaptive self attention (distance-biased) ----
        centers = query_box[..., :2]
        # eps inside the sqrt: the diagonal is exactly 0 and d||x||/dx at
        # x=0 is NaN, which would poison every gradient through query_box
        diff = centers[:, :, None] - centers[:, None]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)  # [B, Q, Q]
        tau = self.param(
            "tau", nn.initializers.ones, (self.num_heads,)
        )
        qkv = nn.Dense(3 * c, name="qkv")(
            nn.LayerNorm(name="ln_attn")(query_feat)
        )
        qh, kh, vh = jnp.split(qkv, 3, axis=-1)
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(b, q, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(qh), heads(kh), heads(vh)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd)
        logits = logits - jax.nn.relu(tau)[None, :, None, None] * dist[:, None]
        attn = jax.nn.softmax(logits, axis=-1)
        sa = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        sa = sa.transpose(0, 2, 1, 3).reshape(b, q, c)
        x = query_feat + nn.Dense(c, name="attn_out")(sa)

        # ---- adaptive sampling ----
        p = self.num_points
        offsets = nn.Dense(
            p * 3, name="offset_gen",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.normal(0.5),
        )(x).reshape(b, q, p, 3)
        # offsets live in the box frame, scaled by box size
        wlh = query_box[..., 3:6][:, :, None, :]
        yaw = query_box[..., 6]
        cy, sy = jnp.cos(yaw), jnp.sin(yaw)
        local = offsets * wlh * 0.5
        rx = local[..., 0] * cy[..., None] - local[..., 1] * sy[..., None]
        ry = local[..., 0] * sy[..., None] + local[..., 1] * cy[..., None]
        pts = jnp.stack(
            [
                query_box[..., 0][..., None] + rx,
                query_box[..., 1][..., None] + ry,
                query_box[..., 2][..., None] + local[..., 2],
            ],
            axis=-1,
        )  # [B, Q, P, 3] ego-frame sample points

        # project to every camera: lidar -> cam -> pixels, pick per-point
        # best view (max depth in front)
        lidar2img = img_meta["lidar2img"]  # [B, N, 4, 4]
        n_cam = lidar2img.shape[1]
        hom = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)
        cam = jnp.einsum("bnij,bqpj->bnqpi", lidar2img, hom)
        depth = cam[..., 2]
        in_front_safe = depth > 0.1
        # safe divide: behind-camera rays would otherwise produce inf/NaN
        # that poison gradients through the later jnp.where selects
        safe_depth = jnp.where(in_front_safe, depth, 1.0)
        uv = jnp.where(
            in_front_safe[..., None], cam[..., :2] / safe_depth[..., None],
            0.0,
        )
        h0, w0 = img_meta["input_size"]
        u = uv[..., 0] / w0
        v = uv[..., 1] / h0
        in_front = depth > 0.1
        visible = in_front & (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        # choose the camera with the largest visible depth margin
        score = jnp.where(visible, depth, -jnp.inf)
        best_cam = jnp.argmax(score, axis=1)  # [B, Q, P]
        bq = jnp.arange(b)[:, None, None]
        u_sel = jnp.take_along_axis(
            u.transpose(0, 2, 3, 1), best_cam[..., None], axis=-1
        )[..., 0]
        v_sel = jnp.take_along_axis(
            v.transpose(0, 2, 3, 1), best_cam[..., None], axis=-1
        )[..., 0]
        any_visible = jnp.any(visible, axis=1)
        view = best_cam / jnp.maximum(n_cam - 1, 1)
        loc = jnp.stack([u_sel, v_sel, view], axis=-1)  # [B, Q, P, 3]
        loc = jnp.where(any_visible[..., None], loc, -1.0)  # off-grid -> 0s

        weights = jax.nn.softmax(
            nn.Dense(self.num_levels, name="scale_weight_gen")(x), axis=-1
        )
        weights = jnp.broadcast_to(
            weights[:, :, None, :], (b, q, p, self.num_levels)
        )
        sampled = msmv_sampling(mlvl_feats, loc, weights)  # [B, Q, P, C]
        x = AdaptiveMixing(dim=c, num_points=p, name="mixing")(x, sampled)

        # ---- FFN + refinement ----
        y = nn.Dense(2 * c, name="ffn1")(nn.LayerNorm(name="ln_ffn")(x))
        x = x + nn.Dense(c, name="ffn2")(nn.gelu(y))
        delta = nn.Dense(
            9, name="refine", kernel_init=nn.initializers.zeros
        )(x)
        new_box = jnp.concatenate(
            [
                query_box[..., :3] + delta[..., :3],
                query_box[..., 3:6] * jnp.exp(delta[..., 3:6]),
                query_box[..., 6:7] + delta[..., 6:7],
                query_box[..., 7:9] + delta[..., 7:9],
            ],
            axis=-1,
        )
        return x, new_box


class SparseBEVDecoder(nn.Module):
    """Q learned pillar queries refined over L layers; per-layer class
    logits + boxes (deep supervision like DETR)."""

    dim: int = 256
    num_queries: int = 200
    num_layers: int = 3
    num_classes: int = 10
    num_points: int = 8
    num_levels: int = 4
    point_cloud_range: Tuple[float, ...] = (
        -51.2, -51.2, -5.0, 51.2, 51.2, 3.0
    )

    @nn.compact
    def __call__(self, mlvl_feats, img_meta, train=False):
        b = mlvl_feats[0].shape[0]
        pcr = self.point_cloud_range
        init_norm = self.param(
            "query_boxes",
            nn.initializers.uniform(1.0),
            (self.num_queries, 9),
        )
        # normalized init -> metric boxes
        cx = pcr[0] + init_norm[:, 0] * (pcr[3] - pcr[0])
        cy = pcr[1] + init_norm[:, 1] * (pcr[4] - pcr[1])
        cz = pcr[2] + init_norm[:, 2] * (pcr[5] - pcr[2])
        wlh = 1.0 + 3.0 * init_norm[:, 3:6]
        yaw = (init_norm[:, 6] - 0.5) * 2 * jnp.pi
        vel = (init_norm[:, 7:9] - 0.5) * 2.0
        box0 = jnp.concatenate(
            [jnp.stack([cx, cy, cz], -1), wlh, yaw[:, None], vel], axis=-1
        )
        query_box = jnp.broadcast_to(box0[None], (b,) + box0.shape)
        query_feat = jnp.broadcast_to(
            self.param(
                "query_feat", nn.initializers.normal(0.02),
                (self.num_queries, self.dim),
            )[None],
            (b, self.num_queries, self.dim),
        )

        outs = []
        for i in range(self.num_layers):
            query_feat, query_box = SparseBEVDecoderLayer(
                dim=self.dim, num_points=self.num_points,
                num_levels=self.num_levels, name=f"layer{i}",
            )(query_feat, query_box, mlvl_feats, img_meta, train=train)
            logits = nn.Dense(self.num_classes, name=f"cls{i}")(
                nn.LayerNorm(name=f"cls_ln{i}")(query_feat)
            )
            outs.append((logits, query_box))
        return outs


def set_prediction_loss(
    outs, gt_boxes, gt_labels, gt_mask,
    cls_weight=2.0, box_weight=0.25, focal_gamma=2.0, focal_alpha=0.25,
):
    """DETR-style deep-supervised loss over all decoder layers.

    gt_boxes [B, M, 9]; gt_labels [B, M]; gt_mask [B, M].
    """
    losses = {}
    for li, (logits, boxes) in enumerate(outs):
        b, q, ncls = logits.shape
        m = gt_boxes.shape[1]
        # matching cost: L1 box distance + classification cost
        l1 = jnp.sum(
            jnp.abs(boxes[:, :, None, :] - gt_boxes[:, None, :, :]), -1
        )  # [B, Q, M]
        probs = jax.nn.sigmoid(logits)
        cls_cost = -jnp.take_along_axis(
            probs[:, :, None, :].repeat(m, axis=2),
            jnp.maximum(gt_labels, 0)[:, None, :, None].repeat(q, axis=1),
            axis=-1,
        )[..., 0]
        cost = jax.lax.stop_gradient(l1 * box_weight + cls_cost * cls_weight)
        assign = hungarian_match(cost, gt_mask)  # [B, M] query idx

        # classification: matched queries get their GT class, rest bg
        target = jnp.zeros((b, q, ncls))
        valid = (assign >= 0) & (gt_mask > 0.5)
        bidx = jnp.arange(b)[:, None]
        qidx = jnp.maximum(assign, 0)
        onehot = jax.nn.one_hot(jnp.maximum(gt_labels, 0), ncls)
        target = target.at[bidx, qidx].add(
            onehot * valid[..., None]
        )
        p = jax.nn.sigmoid(logits)
        pt = p * target + (1 - p) * (1 - target)
        alpha_t = focal_alpha * target + (1 - focal_alpha) * (1 - target)
        focal = (
            -alpha_t * (1 - pt) ** focal_gamma
            * jnp.log(jnp.clip(pt, 1e-8, 1.0))
        )
        num_pos = jnp.maximum(jnp.sum(valid), 1.0)
        losses[f"layer{li}_loss_cls"] = cls_weight * jnp.sum(focal) / num_pos

        matched_boxes = boxes[bidx, qidx]  # [B, M, 9]
        l1_loss = jnp.sum(
            jnp.abs(matched_boxes - gt_boxes) * valid[..., None]
        ) / num_pos
        losses[f"layer{li}_loss_box"] = box_weight * l1_loss
    return losses
