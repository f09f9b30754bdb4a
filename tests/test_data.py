"""TartanAir data pipeline: build_scene_info on a synthetic scene tree,
then frame sampling / augmentation / batching (reference data_readers/)."""
import os
import os.path as osp

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cdvslam_tpu.data.tartan import (
    TartanAirDataset, build_scene_info, is_test_scene,
)

NFRAMES = 70


@pytest.fixture(scope="module")
def scene_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("tartan")
    scene = root / "office" / "office" / "Easy" / "P001"
    (scene / "image_left").mkdir(parents=True)
    (scene / "depth_left").mkdir(parents=True)
    rng = np.random.RandomState(0)
    poses = []
    for i in range(NFRAMES):
        img = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(scene / "image_left" / f"{i:06d}_left.png"), img)
        depth = 4.0 + rng.rand(64, 80).astype(np.float32)
        np.save(str(scene / "depth_left" / f"{i:06d}_left_depth.npy"), depth)
        # NED pose: slow forward motion, identity rotation
        poses.append([0.02 * i, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0])
    np.savetxt(str(scene / "pose_left.txt"), np.asarray(poses), delimiter=" ")
    out = root / "TartanAir.pickle"
    info = build_scene_info(str(root), str(out))
    return root, out, info


def test_build_scene_info(scene_tree):
    root, out, info = scene_tree
    assert len(info) == 1
    scene = next(iter(info))
    assert not is_test_scene(scene)
    s = info[scene]
    assert len(s["images"]) == NFRAMES and len(s["depths"]) == NFRAMES
    assert s["poses"].shape == (NFRAMES, 7)
    # frame graph: adjacent frames co-visible (small flow), self-flow ~0
    j, flows = s["graph"][0]
    assert 0 in j
    assert flows[list(j).index(0)] < 1.0
    assert 1 in j


def test_dataset_sampling_and_batches(scene_tree):
    root, out, _ = scene_tree
    db = TartanAirDataset(str(root), n_frames=5, crop_size=(48, 64),
                          fmin=0.001, fmax=75.0,
                          scene_info_path=str(out), seed=3)
    assert len(db) > 0
    images, poses, disps, intrinsics = db[0]
    assert images.shape == (5, 48, 64, 3)
    assert disps.shape == (5, 48, 64)
    assert poses.shape == (5, 7) and intrinsics.shape == (5, 4)
    assert np.isfinite(disps).all() and (disps > 0).all()
    # 0.98-quantile normalization: scaled so quantile(disps)*0.7 ~ 1
    assert 0.5 < np.quantile(disps, 0.98) < 3.0

    for batch in db.batches(2, 1):
        assert batch["images"].shape == (2, 5, 48, 64, 3)
        assert batch["disps"].shape == (2, 5, 12, 16)
        assert batch["poses"].shape == (2, 5, 7)
        assert batch["intrinsics"].shape == (2, 4)


def test_frame_format_readers_roundtrip(tmp_path):
    """formats.py: .flo write/read roundtrip, PFM both endiannesses and
    bottom-up row order, extension dispatch (reference frame_utils.py)."""
    import numpy as np

    from cdvslam_tpu.data.formats import (
        read_flow, read_gen, read_pfm, write_flow,
    )

    rng = np.random.RandomState(0)
    flow = rng.randn(12, 17, 2).astype(np.float32)
    p = tmp_path / "a.flo"
    write_flow(str(p), flow)
    back = read_flow(str(p))
    np.testing.assert_array_equal(back, flow)
    np.testing.assert_array_equal(read_gen(str(p)), flow)

    # PFM little-endian grayscale, bottom-up
    data = rng.rand(9, 7).astype(np.float32)
    pf = tmp_path / "d.pfm"
    with open(pf, "wb") as f:
        f.write(b"Pf\n")
        f.write(b"7 9\n")
        f.write(b"-1.0\n")
        np.flipud(data).astype("<f").tofile(f)
    np.testing.assert_allclose(read_pfm(str(pf)), data, rtol=1e-6)
