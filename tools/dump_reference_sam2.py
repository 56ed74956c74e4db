# Dump reference SAM2-t (random init) state + staged outputs for parity tests.
# Runs inside /root/reference with the ref_shim on PYTHONPATH (torch cpu).
import sys

import numpy as np
import torch

out_npz = sys.argv[1]
torch.manual_seed(0)
from ultralytics.models.sam.build import build_sam2_t

S = 128
m = build_sam2_t(checkpoint=None).eval().float()
m.set_imgsz((S, S))
m.sam_image_embedding_size = S // 16  # set_imgsz misses this derived field

x = torch.from_numpy(np.random.RandomState(7).rand(1, 3, S, S).astype(np.float32))
pts = torch.tensor([[[40.0, 70.0]]])  # pixel coords
labs = torch.tensor([[1]], dtype=torch.int32)

with torch.no_grad():
    bb = m.forward_image(x)
    _, vision_feats, vision_pos, feat_sizes = m._prepare_backbone_features(bb)
    # frame 0: init conditioning frame, no memory
    feat0 = vision_feats[-1] + m.no_mem_embed
    g = feat_sizes[-1][0]
    pix = feat0.permute(1, 2, 0).view(1, 256, g, g)
    hi_feats = [
        xx.permute(1, 2, 0).view(xx.size(1), xx.size(2), *ss)
        for xx, ss in zip(vision_feats[:-1], feat_sizes[:-1])
    ]
    sam_out = m._forward_sam_heads(pix, point_inputs={"point_coords": pts, "point_labels": labs},
                                   high_res_features=hi_feats, multimask_output=True)
    (low_multi, hi_multi, ious, low_res, high_res, obj_ptr, obj_logits) = sam_out
    # memory encoding of frame 0
    maskmem, maskmem_pos = m._encode_new_memory(vision_feats, feat_sizes, high_res,
                                                obj_logits, is_mask_from_pts=True)
    # frame 1: memory-conditioned features (1 memory frame + 1 obj ptr)
    mem = maskmem.flatten(2).permute(2, 0, 1)
    mem_pos = maskmem_pos[-1].flatten(2).permute(2, 0, 1) + m.maskmem_tpos_enc[m.num_maskmem - 1]
    ptr_tokens = obj_ptr.reshape(-1, 1, 256 // m.mem_dim, m.mem_dim).permute(0, 2, 1, 3).flatten(0, 1)
    from ultralytics.models.sam.modules.utils import get_1d_sine_pe
    obj_pos = get_1d_sine_pe(torch.tensor([0.0]) / (16 - 1), dim=m.mem_dim)
    obj_pos = m.obj_ptr_tpos_proj(obj_pos).unsqueeze(1).expand(-1, 1, m.mem_dim)
    obj_pos = obj_pos.repeat_interleave(256 // m.mem_dim, dim=0)
    memory = torch.cat([mem, ptr_tokens], dim=0)
    memory_pos = torch.cat([mem_pos, obj_pos], dim=0)
    cond = m.memory_attention(curr=vision_feats[-1:], curr_pos=vision_pos[-1:],
                              memory=memory, memory_pos=memory_pos,
                              num_obj_ptr_tokens=ptr_tokens.shape[0])

sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
np.savez(
    out_npz,
    __input__=x.numpy(), __pts__=pts.numpy(), __labs__=labs.numpy(),
    __fpn0__=bb["backbone_fpn"][0].numpy(), __fpn1__=bb["backbone_fpn"][1].numpy(),
    __fpn2__=bb["backbone_fpn"][2].numpy(), __pos2__=bb["vision_pos_enc"][2].numpy(),
    __low_multi__=low_multi.numpy(), __ious__=ious.numpy(),
    __low_res__=low_res.numpy(), __obj_ptr__=obj_ptr.numpy(),
    __obj_logits__=obj_logits.numpy(),
    __maskmem__=maskmem.numpy(), __maskmem_pos__=maskmem_pos[-1].numpy(),
    __cond__=cond.numpy(),
    **sd,
)
print("dumped", len(sd), "keys; cond", tuple(cond.shape))
