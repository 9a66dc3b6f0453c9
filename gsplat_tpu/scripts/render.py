"""Offline render CLI — mirror of reference render.py:26-126.

python -m gsplat_tpu.scripts.render -m <model> [--skip_train --skip_test]
    [--inter_test_frames N] [--render_file poses_render.npy] [--video]
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import numpy as np


def render_set(model_path, name, iteration, views, gaussians, background,
               backend="auto", renderer=None):
    """render.py:26-43: save render/gt/depth PNGs per view."""
    import jax.numpy as jnp
    from PIL import Image

    from gsplat_tpu.renderer import render

    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    depth_path = os.path.join(model_path, name, f"ours_{iteration}", "depth")
    for p in (render_path, gts_path, depth_path):
        os.makedirs(p, exist_ok=True)

    for idx, view in enumerate(views):
        out = (renderer(view) if renderer is not None else
               render(view, gaussians, bg_color=background, backend=backend))
        img = np.clip(np.asarray(out["render"]), 0, 1).transpose(1, 2, 0)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(render_path, f"{idx:05d}.png"))
        gt = np.clip(np.asarray(view.image), 0, 1).transpose(1, 2, 0)
        Image.fromarray((gt * 255).astype(np.uint8)).save(
            os.path.join(gts_path, f"{idx:05d}.png"))
        d = np.asarray(out["depth"])
        d = d / (d.max() + 1e-9)
        Image.fromarray((d * 255).astype(np.uint8)).save(
            os.path.join(depth_path, f"{idx:05d}.png"))
    return render_path


def render_path_frames(views_matrices, template_cam, gaussians, background,
                       backend="auto"):
    """Render a sequence of world-view matrices with a template camera's
    intrinsics (render.py:45-80)."""
    from gsplat_tpu.core.cameras import MiniCam
    from gsplat_tpu.renderer import render

    frames = []
    proj = template_cam.projection_matrix
    for M in views_matrices:
        cam = MiniCam(template_cam.image_width, template_cam.image_height,
                      template_cam.FoVy, template_cam.FoVx,
                      template_cam.znear if hasattr(template_cam, "znear") else 0.01,
                      getattr(template_cam, "zfar", 100.0),
                      M.astype(np.float32), (M @ proj).astype(np.float32))
        out = render(cam, gaussians, bg_color=background, backend=backend)
        frames.append(np.asarray(out["render"]))
    return frames


def make_tile_renderer(n: int, scene, gaussians, background, backend,
                       sh_degree: int):
    """Tile-row-sharded view renderer over an n-device mesh (bit-exact vs
    the single-device render — parallel/tile_parallel.py); the multi-chip
    product surface for offline set rendering."""
    import jax.numpy as jnp

    from gsplat_tpu.core import transforms as Tr
    from gsplat_tpu.ops.rasterize import RasterizeConfig
    from gsplat_tpu.parallel.tile_parallel import (
        make_tile_mesh, make_tile_sharded_render, slice_camera,
    )

    cams = scene.getTrainCameras() or scene.getTestCameras()
    W, H = cams[0].image_width, cams[0].image_height
    if H % (16 * n) != 0:
        raise ValueError(f"--tile_parallel {n} needs image height ({H}) to "
                         "split into whole 16-px tile rows per device")
    cfg = RasterizeConfig(width=W, height=H, sh_degree=sh_degree,
                          max_instances=1 << 20, backend=backend)
    fn = make_tile_sharded_render(make_tile_mesh(n), cfg)
    p = gaussians.params
    bg = jnp.asarray(background)

    def tile_render(view):
        out = fn(p.xyz, Tr.scaling_activation(p.scaling), p.rotation,
                 Tr.opacity_activation(p.opacity[:, 0]),
                 jnp.concatenate([p.features_dc, p.features_rest], axis=1),
                 slice_camera(view, n), bg)
        if bool(out["overflow"]):
            print("[render] WARNING: instance capacity overflow on "
                  f"view — raise max_instances")
        return out

    return tile_render


def main(argv=None):
    from gsplat_tpu.config import (ModelParams, PipelineParams,
                                   get_combined_args)

    parser = ArgumentParser(description="Testing script parameters")
    model = ModelParams(parser, sentinel=True)
    PipelineParams(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--inter_test_frames", default=0, type=int)
    parser.add_argument("--render_file", default=None, type=str)
    parser.add_argument("--video", action="store_true")
    parser.add_argument("--set_video", choices=["plain", "depth"],
                        default=None,
                        help="export each rendered set as an mp4; 'depth' "
                             "composites the depth pane side-by-side "
                             "(composite_video.py save_vidio)")
    parser.add_argument("--backend", default="auto", type=str)
    parser.add_argument("--tile_parallel", default=1, type=int,
                        help="shard each image's 16px tile rows over N "
                             "devices (bit-exact vs single-device)")
    if argv is not None:
        sys.argv = ["render.py"] + list(argv)
    args = get_combined_args(parser)
    print("Rendering " + args.model_path)

    import jax.numpy as jnp

    from gsplat_tpu.data.scene import Scene
    from gsplat_tpu.models.gaussians import GaussianModel
    from gsplat_tpu.viz.camera_trajectory import inter_poses, load_poses

    dataset = model.extract(args)
    gaussians = GaussianModel(dataset.sh_degree,
                              num_class=getattr(dataset, "num_class", 2))
    scene = Scene(dataset, gaussians, load_iteration=args.iteration,
                  shuffle=False)
    background = jnp.ones(3) if dataset.white_background else jnp.zeros(3)

    renderer = None
    if args.tile_parallel > 1:
        renderer = make_tile_renderer(args.tile_parallel, scene, gaussians,
                                      background, args.backend,
                                      dataset.sh_degree)
    elif (getattr(args, "convert_SHs_python", False)
          or getattr(args, "compute_cov3D_python", False)):
        # pipe debug backends: SH->RGB / cov3D from the jnp oracle paths
        # (reference gaussian_renderer/__init__.py:341-359)
        from gsplat_tpu.renderer import render as _render
        renderer = lambda view: _render(  # noqa: E731
            view, gaussians, bg_color=background, backend=args.backend,
            convert_SHs_python=bool(getattr(args, "convert_SHs_python",
                                            False)),
            compute_cov3D_python=bool(getattr(args, "compute_cov3D_python",
                                              False)))
    if not args.skip_train:
        render_set(dataset.model_path, "train", scene.loaded_iter,
                   scene.getTrainCameras(), gaussians, background,
                   args.backend, renderer=renderer)
    if not args.skip_test:
        render_set(dataset.model_path, "test", scene.loaded_iter,
                   scene.getTestCameras(), gaussians, background,
                   args.backend, renderer=renderer)

    if getattr(args, "set_video", None):
        # set-level mp4 export: plain or with the side-by-side depth pane
        # (reference composite_video.py save_vidio / save_vidio_no_depth)
        from gsplat_tpu.viz.video import save_vidio, save_vidio_no_depth
        writer = (save_vidio if args.set_video == "depth"
                  else save_vidio_no_depth)
        for name, skip in (("train", args.skip_train),
                           ("test", args.skip_test)):
            if not skip:
                print("set video:",
                      writer(dataset.model_path, name, scene.loaded_iter))

    frames = None
    cams = scene.getTrainCameras() or scene.getTestCameras()
    if args.inter_test_frames:
        keys = [c.world_view_transform for c in
                (scene.getTestCameras() or cams)]
        path = inter_poses(keys, args.inter_test_frames)
        frames = render_path_frames(path, cams[0], gaussians, background,
                                    args.backend)
    elif args.render_file:
        path = load_poses(args.render_file)
        frames = render_path_frames(path, cams[0], gaussians, background,
                                    args.backend)

    if frames is not None:
        out_dir = os.path.join(dataset.model_path, "path_renders")
        if args.video:
            from gsplat_tpu.viz.video import save_video
            save_video(frames, os.path.join(dataset.model_path, "path.mp4"))
        else:
            from gsplat_tpu.viz.video import save_frames
            save_frames(frames, out_dir)


if __name__ == "__main__":
    main()
