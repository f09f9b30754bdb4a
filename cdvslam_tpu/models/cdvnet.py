"""CDVNet -- the flagship semantic network (reference: cdvslam/net_cdv.py).

Matching features come from XFeat blocks 1-2 (24ch, 1/4 res); context
features are DINOv2 ViT-S/14 tokens from intermediate layers [2,5,8,11]
with the final norm applied to each (net_cdv.py:216-224); the update
operator is the gated linear attention variant with learnable-Fourier
rotary encodings.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import LearnableFourierPositionalEncoding
from .dinov2 import DinoVisionTransformer, pad_to_multiple
from .update import UpdateCDV, UpdateAux
from .xfeat import XFeatF

DIMI = 384
DIMF = 24
SCALEI = 14.0
SCALEF = 4.0


class CDVNet(nn.Module):
    P: int = 3
    DIM: int = DIMI
    DIMF: int = DIMF
    RES: int = 4
    compute_score: bool = False
    dino_adapt: bool = False
    simple_preprocess: bool = True    # CDV uses x/255 (slam.py:370-378)

    def setup(self):
        self.xfeat_f = XFeatF()
        self.dino = DinoVisionTransformer()
        if self.dino_adapt:
            self.dino_adapter = nn.Dense(DIMI, use_bias=False)
        if self.compute_score:
            self.score_head = nn.Sequential(
                [nn.Dense(DIMI // 3), nn.relu, nn.Dense(1), nn.sigmoid]
            )
        self.update_op = UpdateCDV(self.P)
        self.posenc_mod = LearnableFourierPositionalEncoding(2, DIMI // 8)

    def features_f(self, images):
        """Matching features (net_cdv.py:190-205,284): (N, 24, H/4, W/4),
        scaled by 1/4. images: (N, H, W, 3) in [0,1]."""
        f = self.xfeat_f(images) / 4.0
        return f.transpose(0, 3, 1, 2)

    def features_i(self, images):
        """Context tokens (net_cdv.py:207-269): pad to %14, DINOv2 taps
        [2,5,8,11], final-norm the last tap -> token map (N, 384, h, w)
        scaled by 1/4 (the /4 from net_cdv.py:287). Also returns the raw
        last-layer (tokens, cls) pre-norm for the depth head and the
        normalized tokens for the seg/score heads."""
        imgs = pad_to_multiple(images, int(SCALEI), "right")
        N, Hp, Wp, _ = imgs.shape
        taps = self.dino(imgs, taps=(2, 5, 8, 11))
        last = taps[-1]
        tokens_norm = self.dino.norm_tokens(last)[:, 1:]      # (N, L, 384)
        cls_raw = last[:, 0]
        tokens_raw = last[:, 1:]
        h, w = Hp // int(SCALEI), Wp // int(SCALEI)
        tmap = tokens_norm.reshape(N, h, w, DIMI).transpose(0, 3, 1, 2) / 4.0
        score_map = None
        if self.compute_score:
            score_map = self.score_head(tokens_norm).reshape(N, h, w)
        return tmap, tokens_norm, tokens_raw, cls_raw, score_map

    def features_i_taps(self, images):
        """features_i plus the four RAW (pre-norm) DINO tap maps for the
        DPT depth head (reference net_cdv.py:217-221, 254-260): list of
        ((N, h, w, 384) token map, (N, 384) cls) pairs in tap order."""
        imgs = pad_to_multiple(images, int(SCALEI), "right")
        N, Hp, Wp, _ = imgs.shape
        taps = self.dino(imgs, taps=(2, 5, 8, 11))
        last = taps[-1]
        tokens_norm = self.dino.norm_tokens(last)[:, 1:]
        cls_raw = last[:, 0]
        tokens_raw = last[:, 1:]
        h, w = Hp // int(SCALEI), Wp // int(SCALEI)
        tmap = tokens_norm.reshape(N, h, w, DIMI).transpose(0, 3, 1, 2) / 4.0
        score_map = None
        if self.compute_score:
            score_map = self.score_head(tokens_norm).reshape(N, h, w)
        tap_pairs = [(t[:, 1:].reshape(N, h, w, DIMI), t[:, 0]) for t in taps]
        return tmap, tokens_norm, tokens_raw, cls_raw, score_map, tap_pairs

    def adapt(self, ictx):
        """dino_adapter on gathered context vectors (net_cdv.py:355-357)."""
        if self.dino_adapt:
            return self.dino_adapter(ictx)
        return ictx

    def posenc(self, p_n):
        """Cached rotary embedding of normalized patch coords
        (net_cdv.py:495-499 / slam.py:356-368). p_n: (B, K, 2) ->
        (2, B, 1, K, DIMI//8)."""
        return self.posenc_mod(p_n)

    def update(self, net, inp, corr, aux: UpdateAux, n_kseg: int, posenc=None):
        return self.update_op(net, inp, corr, aux, n_kseg, posenc=posenc)
