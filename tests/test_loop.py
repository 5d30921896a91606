"""Loop-closure building blocks: Umeyama/RANSAC, PGO, keypoints, retrieval."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from wild_video_3d_reconstruction_tpu.loop import (keypoints, pgo, retrieval,
                                                   umeyama)
from wild_video_3d_reconstruction_tpu.loop.netvlad import (DescriptorDatabase,
                                                           VLADDescriptor)
from wild_video_3d_reconstruction_tpu.ops import lie


def random_sim3(rng, scale=True):
    R, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    t = rng.normal(size=3)
    s = np.exp(rng.normal() * 0.3) if scale else 1.0
    return R, t, s


def test_umeyama_exact():
    rng = np.random.default_rng(0)
    R, t, s = random_sim3(rng)
    x = rng.normal(size=(50, 3))
    y = (s * (R @ x.T)).T + t
    Re, te, se = umeyama.umeyama_alignment(x.T, y.T)
    np.testing.assert_allclose(Re, R, atol=1e-8)
    np.testing.assert_allclose(te, t, atol=1e-8)
    np.testing.assert_allclose(se, s, atol=1e-8)


def test_ransac_umeyama_with_outliers():
    rng = np.random.default_rng(1)
    R, t, s = random_sim3(rng)
    x = rng.normal(size=(200, 3))
    y = (s * (R @ x.T)).T + t
    # 30% outliers
    out = rng.random(200) < 0.3
    y[out] += rng.normal(size=(out.sum(), 3)) * 5.0
    Re, te, se, n_inl = umeyama.ransac_umeyama(x, y, iterations=200,
                                               threshold=0.1, seed=0)
    assert n_inl > 100
    np.testing.assert_allclose(Re, R, atol=1e-3)
    np.testing.assert_allclose(se, s, rtol=1e-3)


def test_pgo_closes_synthetic_loop():
    """Drifted circular trajectory + one perfect loop measurement: PGO must
    pull the endpoints together."""
    n = 40
    rng = np.random.default_rng(2)
    # ground truth: closed circle
    angles = np.linspace(0, 2 * np.pi, n)
    xi = np.zeros((n, 6))
    xi[:, 0] = np.cos(angles)
    xi[:, 1] = np.sin(angles)
    gt = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))

    # drifted estimate: accumulate noisy relative poses
    est = [gt[0]]
    for k in range(1, n):
        rel = np.asarray(lie.se3_mul(jnp.asarray(gt[k]),
                                     lie.se3_inv(jnp.asarray(gt[k - 1]))))
        noise = np.zeros(6)
        noise[:3] = 0.02 * rng.normal(size=3)
        rel = np.asarray(lie.se3_mul(lie.se3_exp(jnp.asarray(
            noise, jnp.float32)), jnp.asarray(rel)))
        est.append(np.asarray(lie.se3_mul(jnp.asarray(rel),
                                          jnp.asarray(est[-1]))))
    est = np.stack(est).astype(np.float32)     # w2c drifted

    # loop measurement: true relative Sim3 between frames (n-2, 1)
    i, j = n - 2, 1
    C = lie.se3_to_sim3(lie.se3_mul(jnp.asarray(gt[j]),
                                    lie.se3_inv(jnp.asarray(gt[i]))))
    final = pgo.run_pgo(est, np.asarray(C)[None], np.asarray([i]),
                        np.asarray([j]))
    assert final.shape[1] == 8

    # compare loop gap before/after (c2w positions of frames i and j)
    def gap(poses_w2c):
        c2w = np.asarray(lie.se3_inv(jnp.asarray(poses_w2c)))
        gt_c2w = np.asarray(lie.se3_inv(jnp.asarray(gt)))
        d_est = np.linalg.norm(c2w[i, :3] - c2w[j, :3])
        d_gt = np.linalg.norm(gt_c2w[i, :3] - gt_c2w[j, :3])
        return abs(d_est - d_gt)

    before = gap(est)
    after_poses = np.asarray(lie.se3_inv(jnp.asarray(final[:, :7])))
    # splice optimized prefix into trajectory
    fixed = est.copy()
    fixed[:final.shape[0]] = after_poses
    after = gap(fixed)
    assert after < 0.5 * before, (before, after)


def test_keypoints_detect_and_match_shifted():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, size=(96, 128, 3)).astype(np.uint8)
    img = np.asarray(jax.image.resize(jnp.asarray(img, jnp.float32),
                                      (96, 128, 3), "linear")).astype(
        np.uint8)
    shift = 6
    img2 = np.roll(img, shift, axis=1)

    fmap = jnp.asarray(rng.normal(size=(24, 32, 16)), jnp.float32)
    fmap2 = jnp.roll(fmap, shift // 4, axis=1)

    xy1, s1 = keypoints.detect(jnp.asarray(img), 256)
    xy2, s2 = keypoints.detect(jnp.asarray(img2), 256)
    assert float(s1[0]) > 0
    d1 = keypoints.describe(fmap, xy1)
    d2 = keypoints.describe(fmap2, xy2)
    i0, i1, ok = keypoints.match(d1, d2, s1 > 0, s2 > 0)
    ok = np.asarray(ok)
    assert ok.sum() > 20
    # matched keypoints should mostly differ by the shift in x
    dx = np.asarray(xy2)[np.asarray(i1)[ok], 0] - np.asarray(xy1)[
        np.asarray(i0)[ok], 0]
    frac = np.mean(np.abs((dx % 128) - shift) < 2.0)
    assert frac > 0.5, frac


def test_retrieval_protocol():
    db = DescriptorDatabase(dim=8)
    r = retrieval.Retrieval(db, nms=5, skip_window=3)
    rng = np.random.default_rng(4)
    base = rng.normal(size=8)
    base /= np.linalg.norm(base)
    for n in range(10):
        d = rng.normal(size=8)
        d /= np.linalg.norm(d)
        # frame 8 revisits frame 0's descriptor
        r.add_frame(n, base if n in (0, 8) else d)
    r.save_up_to(9)
    cand = r.detect_loop(thresh=0.9, num_repeat=1)
    assert cand is not None
    i, j = cand
    assert i == 8 and j == 1  # j clamped to >= 1


def test_centered_query_desaturates_scores():
    """A large shared descriptor component saturates raw cosine (~1.0 for
    every pair); centered scoring must still rank the true revisit first
    AND separate it from non-matches so a threshold can discriminate."""
    rng = np.random.default_rng(6)
    common = rng.normal(size=64)
    common /= np.linalg.norm(common)

    def desc(key_rng):
        d = 30.0 * common + key_rng.normal(size=64)
        return (d / np.linalg.norm(d)).astype(np.float32)

    db = DescriptorDatabase(dim=64)
    descs = [desc(rng) for _ in range(12)]
    descs.append(descs[2])  # frame 12 revisits frame 2
    for n, d in enumerate(descs):
        db.insert_desc(n, d)
    # raw cosine of unrelated frames saturates > 0.9
    assert descs[0] @ descs[5] > 0.9
    s, j = db.query_online(12, skip_window=3)
    assert j == 2
    assert s > 0.9
    # runner-up (a non-match) must land far below: thresholdable margin
    runner = max(float((descs[k] - np.mean(descs[:10], axis=0))
                       @ (descs[12] - np.mean(descs[:10], axis=0)) /
                       (np.linalg.norm(descs[k] - np.mean(descs[:10], 0)) *
                        np.linalg.norm(descs[12] - np.mean(descs[:10], 0))))
                 for k in range(10) if k != 2)
    assert runner < 0.6


def test_vlad_descriptor_similarity():
    vlad = VLADDescriptor(num_clusters=8, feat_dim=16)
    rng = np.random.default_rng(5)
    f1 = rng.normal(size=(24, 32, 16)).astype(np.float32)
    f2 = f1 + 0.05 * rng.normal(size=f1.shape).astype(np.float32)
    f3 = rng.normal(size=(24, 32, 16)).astype(np.float32)
    d1, d2, d3 = map(vlad.extract, (f1, f2, f3))
    # near-duplicate maps must be much closer than unrelated ones (iid
    # gaussian features share a strong common component, so compare
    # cosine *distances*, not absolute similarity)
    assert d1 @ d2 > d1 @ d3
    assert (1 - d1 @ d2) < 0.3 * (1 - d1 @ d3)


def test_fit_centers_spherical_kmeans():
    """k-means-fitted centers are unit-norm and quantize clustered data
    with lower distortion than data-independent random centers."""
    from wild_video_3d_reconstruction_tpu.loop.netvlad import fit_centers

    rng = np.random.default_rng(0)
    # 8 well-separated modes on the sphere in 16-d
    modes = rng.normal(size=(8, 16))
    modes /= np.linalg.norm(modes, axis=1, keepdims=True)
    x = modes[rng.integers(0, 8, 4000)] + 0.05 * rng.normal(size=(4000, 16))

    centers = fit_centers(x, num_clusters=8, seed=1)
    assert centers.shape == (8, 16)
    np.testing.assert_allclose(np.linalg.norm(centers, axis=1), 1.0,
                               atol=1e-5)

    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    rand = rng.normal(size=(8, 16))
    rand /= np.linalg.norm(rand, axis=1, keepdims=True)
    fit_cos = (xn @ centers.T).max(axis=1).mean()
    rand_cos = (xn @ rand.T).max(axis=1).mean()
    assert fit_cos > rand_cos + 0.1
    # every mode captured by some center
    assert (modes @ centers.T).max(axis=1).min() > 0.9


def test_dbow_backend_retrieval():
    """`RETRIEVAL_BACKEND=dbow` routes the standard Retrieval protocol
    through the native binary inverted file (`retrieval_dbow.py:28`
    counterpart)."""
    pytest.importorskip("ctypes")
    from wild_video_3d_reconstruction_tpu import native
    from wild_video_3d_reconstruction_tpu.loop.retrieval import (
        Retrieval, make_database)

    if native.get_lib() is None:
        pytest.skip("native graphlib unavailable")

    rng = np.random.default_rng(0)
    base = rng.normal(size=2048).astype(np.float32)
    db = make_database("dbow", dim=2048, skip_window=4)
    retr = Retrieval(db, nms=2, skip_window=4)
    for i in range(12):
        desc = (base + 0.02 * rng.normal(size=2048).astype(np.float32)
                if i in (0, 10) else
                rng.normal(size=2048).astype(np.float32))
        retr.add_frame(i, desc)
        retr.save_up_to(i)          # nothing evicts in this synthetic run
    cand = retr.detect_loop(thresh=0.5, num_repeat=1)
    assert cand is not None
    i, j = cand
    # the protocol clamps j to >= 1 (anchor-frame guard)
    assert (i, j) == (10, 1), cand


def test_pgo_device_matches_host():
    """The on-device dense-LM PGO must match the host sparse-LM result on
    the same synthetic loop graph (both start from the same drifted
    estimate and optimize the same constraints)."""
    n = 24
    rng = np.random.default_rng(5)
    angles = np.linspace(0, 2 * np.pi, n)
    xi = np.zeros((n, 6))
    xi[:, 0] = np.cos(angles)
    xi[:, 1] = np.sin(angles)
    gt = np.asarray(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
    est = [gt[0]]
    for k in range(1, n):
        rel = np.asarray(lie.se3_mul(jnp.asarray(gt[k]),
                                     lie.se3_inv(jnp.asarray(gt[k - 1]))))
        noise = np.zeros(6)
        noise[:3] = 0.03 * rng.normal(size=3)
        rel = np.asarray(lie.se3_mul(
            lie.se3_exp(jnp.asarray(noise, jnp.float32)), jnp.asarray(rel)))
        est.append(np.asarray(lie.se3_mul(jnp.asarray(rel),
                                          jnp.asarray(est[-1]))))
    est = np.stack(est).astype(np.float32)

    i, j = n - 2, 1
    C = np.asarray(lie.se3_to_sim3(lie.se3_mul(
        jnp.asarray(gt[j]), lie.se3_inv(jnp.asarray(gt[i])))))[None]
    c2w = np.asarray(lie.se3_inv(jnp.asarray(est)))

    host = pgo.perform_updates(c2w, C, np.asarray([i]), np.asarray([j]),
                               iters=25)
    dev = pgo.perform_updates_device(c2w, C, np.asarray([i]),
                                     np.asarray([j]), iters=25)

    # both must satisfy the loop constraint equally well
    def loop_residual(sim3_poses):
        w2c = np.asarray(lie.sim3_inv(jnp.asarray(sim3_poses)))
        r = lie.sim3_log(lie.sim3_mul(jnp.asarray(C[0]), lie.sim3_mul(
            jnp.asarray(w2c[i]), lie.sim3_inv(jnp.asarray(w2c[j])))))
        return float(np.linalg.norm(np.asarray(r)))

    rh, rd = loop_residual(host), loop_residual(dev)
    assert rd < 0.05, rd
    assert abs(rh - rd) < 0.05, (rh, rd)


def test_drift_gate_consistent():
    """r5 closure benefit gate: tiny corrections (map already agrees) are
    consistent; genuine drift-scale corrections pass the gate."""
    import jax.numpy as jnp

    from wild_video_3d_reconstruction_tpu.loop.longterm import \
        drift_gate_consistent
    from wild_video_3d_reconstruction_tpu.ops import lie

    # straight-line path of unit steps, i revisits j's location
    n = 12
    poses = np.zeros((n, 7), np.float32)
    poses[:, 6] = 1.0
    poses[:, 0] = -np.arange(n, dtype=np.float32)  # w2c t = -center
    i, j = 10, 1

    # measurement that EXACTLY matches VO: correction ~ 0 -> consistent
    vo_rel = np.asarray(lie.se3_to_sim3(lie.se3_mul(
        jnp.asarray(poses[j]), lie.se3_inv(jnp.asarray(poses[i])))))
    ok, t_frac, ds = drift_gate_consistent(vo_rel, poses, i, j, gate=0.02)
    assert ok and t_frac < 1e-6 and ds < 1e-6

    # measurement displaced by 10% of the path length -> must APPLY
    meas = vo_rel.copy()
    meas[0] += 0.1 * (i - j)
    ok, t_frac, _ = drift_gate_consistent(meas, poses, i, j, gate=0.02)
    assert not ok and t_frac > 0.05, t_frac

    # scale-only drift of 5% -> must APPLY
    meas = vo_rel.copy()
    meas[7] *= 1.05
    ok, _, ds = drift_gate_consistent(meas, poses, i, j, gate=0.02)
    assert not ok and ds > 0.04, ds
