# Dump reference MobileSAM TinyViT encoder (random init, 128px) for parity.
import sys

import numpy as np
import torch

out_npz = sys.argv[1]
torch.manual_seed(0)
from ultralytics.models.sam.modules.tiny_encoder import TinyViT

S = 128
m = TinyViT(img_size=S, in_chans=3, num_classes=1000, embed_dims=[64, 128, 160, 320],
            depths=[2, 2, 6, 2], num_heads=[2, 4, 5, 10], window_sizes=[7, 7, 14, 7],
            mlp_ratio=4.0, mbconv_expand_ratio=4.0, local_conv_size=3,
            layer_lr_decay=0.8).eval().float()
x = torch.from_numpy(np.random.RandomState(11).rand(1, 3, S, S).astype(np.float32))
with torch.no_grad():
    emb = m(x)  # (1, 256, S/16, S/16)
sd = {f"image_encoder.{k}": v.detach().numpy() for k, v in m.state_dict().items()
      if not k.startswith(("head.", "norm_head."))}
np.savez(out_npz, __input__=x.numpy(), __emb__=emb.numpy(), **sd)
print("emb", tuple(emb.shape), "keys", len(sd))
