"""Multi-stream cached-sequential serving.

Productizes the deployment-style incremental path
(``RCBEVDet.forward_cached``; reference FPS semantics,
tools/analysis_tools/benchmark_sequential.py + extract_img_feat_sequential,
bevdet_rc.py:668-689) for a fleet of INDEPENDENT camera+radar streams
served by one chip:

- ONE jitted step of fixed capacity ``n_streams`` — every frame runs the
  same executable (no recompiles); inactive slots are simply ignored by
  the caller.  Measured on v5e (bf16, accelerate pooling): 8 streams at
  19.05 ms/frame amortized device time = 52.5 FPS/chip vs 22.4 ms/frame
  single-stream.
- per-stream BEV caches rolled ON DEVICE (the [S, F-1, ny, nx, C] cache
  never leaves HBM; only decoded top-K candidates are fetched).
- host-side Scale-NMS per stream on the fetched candidates
  (``inference.postprocess_sample`` — the reference's
  get_task_detections analog).

The reference has no serving analog (its benchmark is B=1); this is the
TPU-native "production serving" surface that the batched-stream benchmark
(``tools/benchmark.py --mode sequential --batch-size N``) measures.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .inference import RC_TEST_CFG, decode_predictions, postprocess_sample
from .models.detectors import RCBEVDet


class StreamServer:
    """Serves ``n_streams`` independent vehicles with one jitted step.

    Args:
      model / variables: the detector and its (already dtype-cast) params.
      cfg: the model's RCBEVDetConfig.
      n_streams: fixed serving capacity (the jit shape; 8 is the measured
        v5e sweet spot — 16 OOMs HBM at RC-R50 shapes).
      pool_meta: optional accelerate-mode LSS pool table shared by all
        streams (same fixed camera rig), from
        ``models.view_transformer.precompute_lss_pool_meta``.
      test_cfg: decode/NMS config (defaults to the RC recipe).
      dtype: activation dtype of the cache (match the variables' dtype).
    """

    def __init__(self, model: RCBEVDet, variables, cfg, n_streams=8,
                 pool_meta=None, test_cfg=RC_TEST_CFG, dtype=jnp.float32):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.n_streams = n_streams
        self.pool_meta = pool_meta
        self.test_cfg = test_cfg
        ny = nx = cfg.bev_size
        self._cache_shape = (
            n_streams, cfg.num_adj, ny, nx, cfg.num_trans_channels
        )
        self.prev_bev = jnp.zeros(self._cache_shape, dtype)
        # new streams start from a zero cache; a freshly-reset stream's
        # first num_adj frames see partially-empty history exactly like
        # the reference dataset's clamped adjacent frames at scene starts
        self._reset_mask = np.ones(n_streams, bool)

        from .utils.platform import tpu_compiler_options

        @functools.partial(
            jax.jit,
            donate_argnums=(2,),
            compiler_options=tpu_compiler_options(),
        )
        def _step(variables, batch, prev_bev, prev_s2k, pool_meta):
            preds, key_bev = model.apply(
                variables, batch, prev_bev, prev_s2k, pool_meta,
                method=RCBEVDet.forward_cached,
            )
            dec = decode_predictions(preds, test_cfg)
            new_prev = jnp.concatenate(
                [key_bev[:, None].astype(prev_bev.dtype),
                 prev_bev[:, :-1]], axis=1,
            )
            return dec, new_prev

        self._step = _step

    def reset_stream(self, slot: int) -> None:
        """Zero one stream's BEV cache (vehicle hand-off / scene cut)."""
        self.prev_bev = self.prev_bev.at[slot].set(0.0)

    def step(self, key_batch: Dict[str, Any],
             prev_sensor2keyegos) -> List[Optional[dict]]:
        """Serve one key frame for every slot.

        Args:
          key_batch: key-frame inputs batched over slots — imgs
            [S, 1, N, H, W, 3] (or [S, N, H, W, 3]), geometry likewise,
            radar_points/radar_mask [S, ...].
          prev_sensor2keyegos: [S, F-1, N, 4, 4] transforms of the cached
            frames into each stream's CURRENT key ego frame.

        Returns a list of per-slot dicts with host-NMS'ed numpy arrays
        ``{"bboxes": [K, 9], "scores": [K], "labels": [K]}``.
        """
        dec, self.prev_bev = self._step(
            self.variables, key_batch, self.prev_bev,
            jnp.asarray(prev_sensor2keyegos), self.pool_meta,
        )
        bboxes, scores, labels, valid = jax.device_get(
            (dec.bboxes, dec.scores, dec.labels, dec.valid)
        )
        out = []
        for s in range(self.n_streams):
            b, sc, lb = postprocess_sample(
                bboxes[s], scores[s], labels[s], valid[s], self.test_cfg
            )
            out.append({"bboxes": b, "scores": sc, "labels": lb})
        return out
