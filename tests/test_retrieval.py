"""Native BoW retrieval tests: place recognition on synthetic textures."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cdvslam_tpu.loop.retrieval import RetrievalBoW


def _textured(seed, H=240, W=320):
    rng = np.random.RandomState(seed)
    img = (rng.rand(H // 8, W // 8) * 255).astype(np.uint8)
    img = cv2.resize(img, (W, H), interpolation=cv2.INTER_NEAREST)
    img = cv2.GaussianBlur(img, (5, 5), 1.0)
    return img


def test_insert_query_roundtrip():
    r = RetrievalBoW(rad=5, thresh=0.0, train_threshold=2000)
    scenes = [_textured(s) for s in range(12)]
    fid = 0
    # two passes over the same 12 scenes: second pass should retrieve the first
    for rep in range(2):
        for s, img in enumerate(scenes):
            # slight viewpoint jitter on the revisit
            if rep == 1:
                M = np.float32([[1, 0, 3], [0, 1, 2]])
                img = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
            r.insert_image(img, fid)
            fid += 1
    assert r.trained
    hits = 0
    for s in range(12):
        q = r.query(12 + s, topk=4)
        if any(j == s for j, _ in q):
            hits += 1
    assert hits >= 9, f"only {hits}/12 revisits retrieved"


def test_match_pair():
    r = RetrievalBoW(rad=1, train_threshold=10**9)
    img = _textured(0)
    M = np.float32([[1, 0, 5], [0, 1, 3]])
    img2 = cv2.warpAffine(img, M, (img.shape[1], img.shape[0]))
    r.insert_image(img, 0)
    r.insert_image(img2, 1)
    a, b = r.match(0, 1)
    assert len(a) >= 20
    # matched keypoints should differ by ~the shift
    d = b - a
    med = np.median(d, axis=0)
    assert abs(med[0] - 5) < 1.5 and abs(med[1] - 3) < 1.5
