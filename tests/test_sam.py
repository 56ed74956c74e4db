"""SAM promptable segmentation (nn/sam.py + engine/sam.py).

Behavioral spec: reference models/sam/ (ViT-B/L/H variants, point/box
prompts, multimask output). Random-init weights; geometric/API behavior is
what is testable without pretrained checkpoints.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_sam():
    from edgeyolo_tpu.engine.sam import SAM

    return SAM("vit_b", img_size=128)  # 8x8 embedding grid: fast on CPU


def test_sam_point_and_box_prompts(tiny_sam):
    img = (np.random.RandomState(0).rand(200, 300, 3) * 255).astype(np.uint8)
    tiny_sam.set_image(img)
    m, iou = tiny_sam(points=[[150, 100]], labels=[1])
    assert m.shape == (1, 200, 300) and m.dtype == bool and iou.shape == (1,)
    m2, iou2 = tiny_sam(bboxes=[50, 40, 250, 160])
    assert m2.shape == (1, 200, 300)
    m3, iou3 = tiny_sam(points=[[150, 100]], labels=[1], multimask_output=True)
    assert np.isfinite(iou3).all()


def test_sam_encode_once_prompt_many(tiny_sam):
    img = (np.random.RandomState(1).rand(128, 128, 3) * 255).astype(np.uint8)
    tiny_sam.set_image(img)
    e1 = np.asarray(tiny_sam._embed)
    a, _ = tiny_sam(points=[[10, 10]], labels=[1])
    b, _ = tiny_sam(points=[[120, 120]], labels=[1])
    assert np.array_equal(np.asarray(tiny_sam._embed), e1)  # embedding cached
    # different prompts give different masks (random weights, but not constant)
    assert (a != b).any() or a.sum() in (0, a.size)


def test_sam_variants_and_sam2_gate():
    from edgeyolo_tpu.nn.sam import _VARIANTS, build_sam

    assert set(_VARIANTS) == {"vit_b", "vit_l", "vit_h"}
    with pytest.raises(NotImplementedError):
        build_sam("sam2_t")
