# Camera-only BEVDepth4D + HoP auxiliary supervision (counterpart of the
# reference's det-256x704-r50-BEV128-9kf-depth-withHoP-cbgs12e-circlelarger.py).
_base_ = ["./det-256x704-r50-BEV128-9kf-depth-cbgs.py"]

model = dict(
    with_hop=True,
    hop_embed_dims=160,
)

hop = dict(loss_weight_aux=1.0)
