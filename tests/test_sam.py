"""SAM promptable segmentation (nn/sam.py + engine/sam.py).

Behavioral spec: reference models/sam/ (ViT-B/L/H variants, point/box
prompts, multimask output). Random-init weights; geometric/API behavior is
what is testable without pretrained checkpoints.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy: see README fast tier


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


def test_sam_variants_and_sam2_redirect():
    from edgeyolo_tpu.nn.sam import _VARIANTS, build_sam

    assert set(_VARIANTS) == {"vit_b", "vit_l", "vit_h"}
    # SAM2 lives in nn/sam2.py; the SAM1 builder redirects by error
    with pytest.raises(ValueError, match="sam2"):
        build_sam("sam2_t")
    # MobileSAM builds through the same entry
    m = build_sam("mobile_sam", img_size=128)
    assert m.mobile


def test_mobile_sam_tinyvit_parity():
    """MobileSAM TinyViT encoder vs the torch reference at random init
    (tiny_encoder.py:765-1013): exact param parity (5,743,892 without the
    unused classifier head) and numerical forward parity at 128px."""
    import subprocess
    import sys
    from pathlib import Path

    import jax
    import jax.numpy as jnp
    import numpy as np

    from edgeyolo_tpu.nn.tinyvit import TinyViT
    from edgeyolo_tpu.utils.torch_convert import convert_mobile_sam_state_dict

    repo = Path(__file__).parent.parent
    cache = Path(__file__).parent / ".cache"
    out = cache / "ref_mobile_sam.npz"
    if not out.exists():
        cache.mkdir(exist_ok=True)
        import os

        env = dict(os.environ, PYTHONPATH=f"{repo}/tools/ref_shim:.")
        subprocess.run([sys.executable, str(repo / "tools/dump_reference_mobile_sam.py"),
                        str(out)], cwd="/root/reference", env=env, check=True, timeout=600)
    z = np.load(out)
    sd = {k: z[k] for k in z.files if not k.startswith("__")}

    m = TinyViT()
    x = jnp.asarray(z["__input__"].transpose(0, 2, 3, 1))
    v = m.init(jax.random.PRNGKey(0), x)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert n == 5743892  # == reference minus the dead classifier head
    # wrap params under image_encoder to reuse the shared converter mapping
    wrapped = {c: {"image_encoder": t} for c, t in v.items()}
    nv, rep = convert_mobile_sam_state_dict(sd, wrapped, strict=True)
    assert not rep["unused"], rep["unused"][:8]
    nv = {c: t["image_encoder"] for c, t in nv.items()}
    nv = jax.tree.map(jnp.asarray, nv)
    emb = m.apply(nv, x)
    theirs = z["__emb__"].transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(emb), theirs, atol=2e-4, rtol=1e-3)


def test_mobile_sam_facade():
    from edgeyolo_tpu.engine.sam import SAM

    sam = SAM("mobile_sam", img_size=128)
    import numpy as np

    img = np.random.RandomState(0).randint(0, 255, (96, 96, 3), np.uint8)
    sam.set_image(img)
    masks, iou = sam(points=[[48, 48]], labels=[1])
    assert masks.shape == (1, 96, 96)


def test_remove_small_regions_holes_islands_nms():
    """reference sam/predict.py:571-620: holes below min_area fill, islands
    below it vanish, and repaired duplicates lose the NMS to untouched masks."""
    from edgeyolo_tpu.engine.sam import remove_small_regions

    m = np.zeros((3, 32, 32), bool)
    m[0, 4:28, 4:28] = True
    m[0, 10:12, 10:12] = False        # 4px hole -> filled
    m[0, 0, 0] = True                 # 1px island -> removed
    m[1, 4:28, 4:28] = True           # clean duplicate of mask 0's body
    m[2, 2:6, 20:30] = True           # distinct clean mask
    new, keep = remove_small_regions(m.copy(), min_area=16, nms_thresh=0.7)
    assert 1 in keep and 2 in keep and 0 not in keep  # untouched twin wins NMS
    assert len(keep) == 2
    # repair semantics on the mask itself
    new0, k0 = remove_small_regions(m[:1].copy(), min_area=16)
    assert k0 == [0]
    assert new0[0, 10, 10]            # hole filled
    assert not new0[0, 0, 0]          # island removed
    assert new0[0, 5, 5]              # body intact
