# Dump a small-config reference SAM (encoder+prompt+decoder) state + outputs.
import sys
from functools import partial

import numpy as np
import torch

out_npz = sys.argv[1]
torch.manual_seed(0)
from ultralytics.models.sam.modules.decoders import MaskDecoder
from ultralytics.models.sam.modules.encoders import ImageEncoderViT, PromptEncoder
from ultralytics.models.sam.modules.transformer import TwoWayTransformer

ie = ImageEncoderViT(img_size=128, patch_size=16, embed_dim=64, depth=4, num_heads=2,
                     out_chans=256, qkv_bias=True,
                     norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
                     use_rel_pos=True, global_attn_indexes=(1, 3), window_size=14)
pe = PromptEncoder(embed_dim=256, image_embedding_size=(8, 8),
                   input_image_size=(128, 128), mask_in_chans=16)
md = MaskDecoder(num_multimask_outputs=3,
                 transformer=TwoWayTransformer(depth=2, embedding_dim=256, mlp_dim=2048, num_heads=8),
                 transformer_dim=256)
for m in (ie, pe, md):
    m.eval().float()

x = torch.from_numpy(np.random.RandomState(7).rand(1, 3, 128, 128).astype(np.float32))
pts = torch.tensor([[[37.0, 61.0], [90.0, 15.0]]])
labs = torch.tensor([[1, 0]])
with torch.no_grad():
    emb = ie(x)
    sparse, dense = pe(points=(pts, labs), boxes=None, masks=None)
    masks, iou = md.predict_masks(emb, pe.get_dense_pe(), sparse, dense)

sd = {}
for prefix, m in (("image_encoder.", ie), ("prompt_encoder.", pe), ("mask_decoder.", md)):
    for k, v in m.state_dict().items():
        sd[prefix + k] = v.detach().numpy()
np.savez(out_npz, __input__=x.numpy(), __pts__=pts.numpy(), __labs__=labs.numpy(),
         __emb__=emb.detach().numpy(), __sparse__=sparse.detach().numpy(), __dense__=dense.detach().numpy(),
         __masks__=masks.detach().numpy(), __iou__=iou.detach().numpy(), **sd)
print("emb", tuple(emb.shape), "masks", tuple(masks.shape), "keys", len(sd))
