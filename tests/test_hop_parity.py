"""HoP BiTemporalPredictor numerics parity vs the REFERENCE source.

Loads the actual reference stack (temporal_backbone.py BiTemporalPredictor
+ TemporalDecoder, encoder.py BEVFormerLayer, temporal_cross_attention.py
TemporalCrossAttention) through refshim's mmcv scaffolding, randomizes it,
converts the weights through the production name map, and compares the
full bi-temporal reconstruction forward against
``models/hop.py::HoPTemporalPredictor`` — closing VERDICT r4 item 7's HoP
half (previously a documented redesign; now a faithful replica)."""

import numpy as np
import torch
import jax
import jax.numpy as jnp

import refshim
from test_reference_module_parity import _convert, _randomize_params


def _decoder_cfg(embed, heads, queue, ffc, num_layers=2):
    return dict(
        type="TemporalDecoder", num_layers=num_layers,
        transformerlayers=dict(
            type="BEVFormerLayer",
            attn_cfgs=[dict(
                type="TemporalCrossAttention", embed_dims=embed,
                num_heads=heads, num_levels=1, num_bev_queue=queue,
                dropout=0.0)],
            ffn_cfgs=dict(
                type="FFN", embed_dims=embed, feedforward_channels=ffc,
                num_fcs=2, ffn_drop=0.0,
                act_cfg=dict(type="ReLU", inplace=True)),
            feedforward_channels=ffc, ffn_dropout=0.0,
            operation_order=("self_attn", "norm", "ffn", "norm")))


def test_hop_bitemporal_predictor_forward_parity():
    mod = refshim.load_temporal_backbone()
    rng = np.random.default_rng(17)
    n_frames, h, w = 4, 8, 12
    in_c, embed, red_c, out_c = 8, 16, 4, 24
    tm = mod.BiTemporalPredictor(
        in_channels=in_c, out_channels=out_c, embed_dims=embed,
        num_adj=n_frames - 1, reduction=4, bev_h=h, bev_w=w,
        decoder_short=_decoder_cfg(embed, 2, 2, 32),
        decoder_long=_decoder_cfg(red_c, 2, n_frames, 8),
    ).eval()
    _randomize_params(tm, rng)
    # non-trivial attention: the randomized sampling_offsets bias (std
    # 0.1 in cell units) keeps samples near the reference points, which
    # is the real regime (init is zeros); widen slightly for coverage
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "sampling_offsets.bias" in name:
                p.copy_(torch.tensor(
                    rng.uniform(-2.0, 2.0, p.shape[0]), dtype=torch.float32))

    frames_t = [
        torch.tensor(rng.standard_normal((2, in_c, h, w)).astype(np.float32))
        for _ in range(n_frames)
    ]
    with torch.no_grad():
        ref_out = tm(frames_t).numpy()  # [B, out_c, H, W]

    from rcbevdet_tpu.models.hop import HoPTemporalPredictor

    model = HoPTemporalPredictor(
        in_channels=in_c, embed_dims=embed, out_channels=out_c,
        reduction=4, num_short=2, num_heads_short=2, num_heads_long=2,
        ffn_short=32, ffn_long=8,
    )
    frames_j = jnp.asarray(
        np.stack([np.moveaxis(f.numpy(), 1, -1) for f in frames_t], axis=1)
    )  # [B, F, H, W, C]
    variables = model.init(jax.random.PRNGKey(0), frames_j)
    variables = _convert(tm, "history_decoder.", variables,
                         ("history_decoder",))
    out = model.apply(variables, frames_j)  # [B, H, W, out_c]
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), -1, 1), ref_out, rtol=1e-4, atol=1e-4
    )
