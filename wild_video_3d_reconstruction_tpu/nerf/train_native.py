"""Native NeRF training driver (the TPU-resident `ns-train` equivalent).

The reference's reconstruction stage shells out to nerfstudio
(`nerf_train/nerf_train.py:21-42`); this driver trains the in-repo
instant-NGP field (`nerf/ngp.py`) on the same `transforms.json` data the
prepare stage emits, end to end inside JAX:

    python -m wild_video_3d_reconstruction_tpu.nerf.train_native \
        --data outputs/scene/nerf  [--steps 2000] [--batch 4096]

or, with no data on disk, a self-contained synthetic run:

    python -m wild_video_3d_reconstruction_tpu.nerf.train_native --synth

Every `--eval_every` steps it reports train loss and held-out PSNR; the
final line is one JSON summary. `--save`/`--render` dump params / a
rendered held-out view.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np

from . import ngp


def load_transforms(data_dir):
    """Read a nerfstudio transforms.json: (images [N,H,W,3] float in
    [0,1], c2ws [N,4,4], intrinsics [N,4], convention)."""
    import cv2

    data_dir = Path(data_dir)
    with open(data_dir / "transforms.json", encoding="utf-8") as f:
        meta = json.load(f)
    images, c2ws, intrs = [], [], []
    for fr in meta["frames"]:
        p = (data_dir / fr["file_path"]).resolve()
        img = cv2.imread(str(p), cv2.IMREAD_COLOR)
        if img is None:
            continue
        images.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB) / 255.0)
        c2ws.append(np.asarray(fr["transform_matrix"], np.float64))
        g = lambda k: fr.get(k, meta.get(k))
        intrs.append([g("fl_x"), g("fl_y"), g("cx"), g("cy")])
    if not images:
        raise FileNotFoundError(f"no readable frames under {data_dir}")
    return (np.asarray(images, np.float32), np.asarray(c2ws),
            np.asarray(intrs, np.float64), "opengl")


def synth_scene(seed=7, frames=16, ht=48, wd=64):
    """Rendered multi-plane orbit scene with exact poses (w2c -> c2w)."""
    from ..train.synth import render_sequence

    images, poses_w2c, intr = render_sequence(seed, frames=frames, ht=ht,
                                              wd=wd, path="orbit",
                                              n_planes=3)
    c2ws = []
    for p in poses_w2c:
        t, q = p[:3], p[3:]
        x, y, z, w = q
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = -R.T @ t
        c2ws.append(c2w)
    intrs = np.tile(np.asarray(intr, np.float64), (frames, 1))
    return (images.astype(np.float32) / 255.0, np.asarray(c2ws), intrs,
            "opencv")


def build_rays(images, c2ws, intrs, convention, content_depth=3.0):
    """Flattened, scene-normalized ray dataset [N, 9] = (o, d, rgb),
    plus (center, scale, near, far) of the unit-cube parameterization."""
    h, w = images.shape[1:3]
    # normalize cameras + a content sample along each view axis into the
    # unit cube so the hash grid covers what the rays actually see
    pts = [c[:3, 3] for c in c2ws]
    fwd_sign = -1.0 if convention == "opengl" else 1.0
    for c in c2ws:
        fwd = fwd_sign * c[:3, 2]
        pts.append(c[:3, 3] + content_depth * fwd)
    center, scale = ngp.normalize_scene(np.asarray(pts))

    rays = []
    for img, c2w, intr in zip(images, c2ws, intrs):
        o, d = ngp.camera_rays(c2w, intr, (h, w), convention)
        o = (np.asarray(o) - center) * scale + 0.5
        rays.append(np.concatenate(
            [o, np.asarray(d), img.reshape(-1, 3)], axis=-1))
    near, far = 0.02, 1.8          # spans the unit cube diagonal
    return np.asarray(rays, np.float32), center, scale, near, far


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-10))


def train(images, c2ws, intrs, convention, steps=2000, batch=4096,
          n_samples=64, levels=8, table_size=2 ** 14, max_res=256,
          lr=1e-2, eval_every=500, holdout=8, seed=0, log=print,
          mesh=None):
    """Train the field; returns (params, static, report dict).

    With `mesh` (a 1-axis `jax.sharding.Mesh` named "dp"), each step's
    ray batch is sharded across devices and the parameters replicated —
    GSPMD inserts the gradient all-reduce, so the same step function
    scales data-parallel over ICI with no code change."""
    import jax
    import jax.numpy as jnp

    all_rays, center, scale, near, far = build_rays(images, c2ws, intrs,
                                                    convention)
    n_imgs = all_rays.shape[0]
    eval_ids = list(range(holdout - 1, n_imgs, holdout)) or [n_imgs - 1]
    train_ids = [i for i in range(n_imgs) if i not in eval_ids]
    rays = jnp.asarray(all_rays[train_ids].reshape(-1, 9))

    key = jax.random.PRNGKey(seed)
    params, static = ngp.field_init(key, levels=levels,
                                    table_size=table_size, max_res=max_res)
    tx = ngp.make_optimizer(lr)
    opt_state = tx.init(params)

    batch_spec = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(mesh, PartitionSpec())
        batch_spec = NamedSharding(mesh, PartitionSpec("dp"))
        rays = jax.device_put(rays, repl)
        params = jax.device_put(params, repl)
        opt_state = jax.device_put(opt_state, repl)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=("nb", "ns"))
    def step_fn(params, opt_state, rays, key, nb, ns):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (nb,), 0, rays.shape[0])
        b = rays[idx]
        if batch_spec is not None:
            b = jax.lax.with_sharding_constraint(b, batch_spec)

        def loss_fn(p):
            rgb, _, _ = ngp.render_rays(p, static, b[:, 0:3], b[:, 3:6],
                                        k2, n_samples=ns, near=near,
                                        far=far)
            return jnp.mean((rgb - b[:, 6:9]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                        updates)
        return params, opt_state, loss

    def eval_psnr(params):
        vals = []
        for i in eval_ids:
            hw = images.shape[1:3]
            tr = lambda o, d: ((o - center) * scale + 0.5, d)
            img, _ = ngp.render_image(params, static, c2ws[i], intrs[i],
                                      hw, n_samples=n_samples, near=near,
                                      far=far, convention=convention,
                                      scene_transform=tr)
            vals.append(psnr(img, images[i]))
        return float(np.mean(vals))

    psnr0 = eval_psnr(params)
    log(f"init: held-out PSNR {psnr0:.2f} dB "
        f"({len(train_ids)} train / {len(eval_ids)} eval views)")
    t0 = time.time()
    loss = None
    for s in range(1, steps + 1):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_fn(params, opt_state, rays, sub,
                                          nb=batch, ns=n_samples)
        if s % eval_every == 0 or s == steps:
            p = eval_psnr(params)
            log(f"step {s}: loss={float(loss):.5f} "
                f"psnr={p:.2f} dB ({time.time() - t0:.0f}s)")
    psnr1 = eval_psnr(params)
    report = {"metric": "nerf_native", "steps": steps,
              "psnr_init": round(psnr0, 3), "psnr": round(psnr1, 3),
              "train_views": len(train_ids), "eval_views": len(eval_ids),
              "seconds": round(time.time() - t0, 1)}
    return params, static, {**report, "center": center, "scale": scale,
                            "near": near, "far": far}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, default=None,
                    help="directory containing transforms.json")
    ap.add_argument("--synth", action="store_true",
                    help="train on a rendered synthetic orbit scene")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--table_log2", type=int, default=14)
    ap.add_argument("--max_res", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--eval_every", type=int, default=500)
    ap.add_argument("--save", type=str, default=None)
    ap.add_argument("--render", type=str, default=None,
                    help="write a rendered held-out view PNG here")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard ray batches data-parallel over N devices")
    args = ap.parse_args(argv)

    if args.synth or args.data is None:
        data = synth_scene()
    else:
        data = load_transforms(args.data)
    images, c2ws, intrs, conv = data

    mesh = None
    if args.mesh:
        import jax
        from jax.sharding import Mesh

        mesh = Mesh(np.asarray(jax.devices()[:args.mesh]), ("dp",))

    params, static, rep = train(images, c2ws, intrs, conv,
                                steps=args.steps, batch=args.batch,
                                n_samples=args.samples,
                                levels=args.levels,
                                table_size=2 ** args.table_log2,
                                max_res=args.max_res, lr=args.lr,
                                eval_every=args.eval_every, mesh=mesh)
    center, scale = rep.pop("center"), rep.pop("scale")
    near, far = rep.pop("near"), rep.pop("far")

    if args.save:
        from ..train.trainer import save_checkpoint
        import jax
        save_checkpoint(jax.device_get(params), args.save, args.steps)
        print("saved field params to", args.save)
    if args.render:
        import cv2
        tr = lambda o, d: ((o - center) * scale + 0.5, d)
        img, depth = ngp.render_image(params, static, c2ws[-1], intrs[-1],
                                      images.shape[1:3],
                                      n_samples=args.samples, near=near,
                                      far=far, convention=conv,
                                      scene_transform=tr)
        cv2.imwrite(args.render,
                    cv2.cvtColor((np.clip(img, 0, 1) * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        print("wrote", args.render)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
