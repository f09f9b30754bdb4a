"""VONet -- the DPVO-compatible baseline network (reference: cdvslam/net_dpv.py).

Inference surface used by the SLAM runtime:
  * ``features``: two stride-4 CNN encoders -> matching fmap (128ch) and
    context imap (384ch), both scaled by 1/4.
  * ``update``: the recurrent update operator (UpdateDPV).
The training rollout lives in cdvslam_tpu/train (uses the same modules).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .encoder import BasicEncoder4
from .update import UpdateDPV, UpdateAux

DIM = 384


class VONet(nn.Module):
    P: int = 3
    DIM: int = DIM
    DIMF: int = 128
    RES: int = 4
    simple_preprocess: bool = False   # DPVO uses 2*(x/255)-0.5

    def setup(self):
        self.fnet = BasicEncoder4(output_dim=self.DIMF, norm_fn="instance")
        self.inet = BasicEncoder4(output_dim=self.DIM, norm_fn="none")
        self.update_op = UpdateDPV(self.P)

    def features(self, images):
        """images: (N, H, W, 3) preprocessed. Returns NCHW maps
        (N, 128, H/4, W/4), (N, 384, H/4, W/4), both divided by 4
        (reference net_dpv.py:113-114)."""
        fmap = self.fnet(images) / 4.0
        imap = self.inet(images) / 4.0
        return fmap.transpose(0, 3, 1, 2), imap.transpose(0, 3, 1, 2)

    def update(self, net, inp, corr, aux: UpdateAux, n_kseg: int, n_gseg: int, posenc=None):
        return self.update_op(net, inp, corr, aux, n_kseg, n_gseg)
