"""Pseudo-data generation CLI (the reference's `utils/create_data.py`).

Canonical use (README.md:79-91):

  python tools/create_data.py --config configs/lego.txt --model_name nerf \
      --teacher_ckpt <nerf ckpt> --create_data rand --n_pose_kd 10000 \
      --datadir_kd data/nerf_synthetic/lego_pseudo

Modes:
  * ``rand``  — random spherical poses, random focal x[1,2), frozen-teacher
    full-frame renders -> shuffled consolidated ray shards
    (reference `create_data.py:777-872`).
  * ``spiral_evenly_spaced`` — even pose grid -> pseudo images + poses
    (reference `create_data.py:749-775`).
  * ``convert_rays`` — real train images -> ``train_*.npy`` ray shards
    (the reference's offline `utils/convert_original_data_to_rays_*.py`).

``--test_teacher`` renders the test split first and reports teacher PSNR
(reference `create_data.py:723-742`).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from r2l_tpu.app import build_teacher, load_dataset, vol_config  # noqa: E402
from r2l_tpu.configs import parse_args  # noqa: E402
from r2l_tpu.datagen import (DataGenConfig, generate_3x3rays,  # noqa: E402
                             generate_patches, generate_pseudo_data,
                             generate_pseudo_images, generate_rand_images,
                             generate_tworays, images_to_ray_records)
from r2l_tpu.data.rayshards import write_ray_shards  # noqa: E402
from r2l_tpu.evaluate import make_nerf_frame_fn, render_path  # noqa: E402
from r2l_tpu.logging_ import Logger  # noqa: E402
from r2l_tpu.sampler import PointSampler  # noqa: E402


def _frame_keep_mask(args, splits, split_ix, ignore_csv, logger):
    """Boolean keep-mask over the concatenated split indices, the
    reference's --ignore semantics: drop frames whose file_path index
    token is listed (`convert_original_data_to_rays_blender.py:106-121,
    133-141`, e.g. './train/r_3' -> token '3'). Blender datasets match
    the filename token; other dataset types fall back to the position
    within the split."""
    import json

    tokens = {t.strip() for t in ignore_csv.split(",") if t.strip()}
    masks = []
    for s in splits:
        n = len(split_ix[s])
        tj = os.path.join(args.datadir, f"transforms_{s}.json")
        if args.dataset_type == "blender" and os.path.isfile(tj):
            with open(tj) as f:
                frames = json.load(f)["frames"]
            # same subsampling as the loader (data/blender.py:63-64)
            skip = (1 if s == "train" or args.testskip == 0
                    else args.testskip)
            frames = frames[::skip]
            assert len(frames) == n, (s, len(frames), n)
            m = np.array([fr["file_path"].split("_")[-1] not in tokens
                          for fr in frames], bool)
        else:
            m = np.array([str(i) not in tokens for i in range(n)], bool)
        masks.append(m)
    mask = np.concatenate(masks)
    if not mask.all():
        logger.print(f"--ignore: dropped {int((~mask).sum())} of "
                     f"{mask.size} frames")
    return mask


def main() -> None:
    args = parse_args()
    from r2l_tpu.app import apply_platform
    apply_platform(args)
    logger = Logger(experiment_name=args.experiment_name or "create_data",
                    experiments_dir=args.experiments_dir, debug=args.debug,
                    args=args)
    ns = load_dataset(args, logger)
    datadir_kd = args.datadir_kd or (args.datadir + "_pseudo")
    if ":" in datadir_kd:
        # Reference create_data CLI form 'old:new' (README.md:79;
        # `create_data.py:744` splits it): old seeds the new dir with the
        # real train frames because the reference's BlenderDataset reads
        # ONE dir. Here the images-mode dataset mixes real frames from
        # --datadir directly, so only the OUTPUT half is needed.
        old, datadir_kd = datadir_kd.split(":", 1)
        logger.print(f"--datadir_kd 'old:new' reference form: writing to "
                     f"{datadir_kd!r} (real frames stay in --datadir; "
                     f"the {old!r} copy-seed step is unnecessary here)")

    if args.create_data == "convert_rays":
        # Student records store RAW camera rays even for LLFF — the
        # reference converter never NDC-warps
        # (`convert_original_data_to_rays_llff.py:114-118`); the warp
        # lives only inside the teacher's volumetric render.
        split_ix = {"train": ns.i_train, "val": ns.i_val,
                    "test": ns.i_test}
        splits = [s.strip() for s in (args.splits or "train").split(",")
                  if s.strip()]
        bad = [s for s in splits if s not in split_ix]
        if bad:
            raise SystemExit(f"ERROR: unknown --splits entries {bad} "
                             "(choose from train,val,test)")
        ignore = args.ignore
        if not ignore and "ficus" in args.datadir:
            # The reference hand-codes this phi>=0 exclusion list for
            # ficus (`convert_original_data_to_rays_blender.py:114-115`).
            ignore = ("10,13,14,24,26,30,31,37,39,40,41,47,48,49,52,54,"
                      "55,57,58,66,67,74,75,76,77,79,81,82,87,88,89,94,"
                      "97,99")
        idx = np.concatenate([np.asarray(split_ix[s]) for s in splits])
        if ignore:
            keep = _frame_keep_mask(args, splits, split_ix, ignore,
                                    logger)
            idx = idx[keep]
        records = images_to_ray_records(
            ns.images[idx], ns.poses[idx],
            ns.H, ns.W, ns.focal, ndc=False, donerf=args.donerf)
        # shard prefix = ''.join(splits), same naming rule as the
        # reference (`...blender.py:119-121`; only 'train_'-prefixed
        # shards count as REAL rays in the rays-mode dataset).
        paths = write_ray_shards(datadir_kd, records,
                                 prefix="".join(splits),
                                 rng=np.random.default_rng(args.seed))
        logger.print(f"wrote {records.shape[0]} real rays "
                     f"({'+'.join(splits)}"
                     f"{', DONeRF ray convention' if args.donerf else ''}) "
                     f"to {len(paths)} shards in {datadir_kd}")
        return

    if not (args.teacher_ckpt or args.pretrained_ckpt):
        # The reference unconditionally loads --teacher_ckpt
        # (`create_data.py:289-296`); a random-init teacher silently
        # generates junk pseudo data — burning an hours-long run on a
        # forgotten/typo'd ckpt. Hard error by default; the explicit
        # opt-out exists for machinery smoke tests.
        if not args.allow_random_teacher:
            raise SystemExit(
                "ERROR: no --teacher_ckpt given — the teacher would be "
                "RANDOM-INIT and the generated pseudo data meaningless "
                "(the reference hard-requires it, create_data.py:289-"
                "296). Pass --teacher_ckpt <trained NeRF ckpt>, or "
                "--allow_random_teacher to proceed anyway (smoke tests).")
        logger.print(
            "WARNING: --allow_random_teacher — the teacher is RANDOM-"
            "INIT and the generated pseudo data is meaningless.")
    ncfg, ncfg_fine, pc, pf, _ = build_teacher(args, logger)
    vcfg = vol_config(args, ns)

    if args.test_teacher:
        sampler = PointSampler(H=ns.H, W=ns.W, focal=ns.focal,
                               n_sample=args.N_samples,
                               near=ns.near, far=ns.far)
        frame_fn = make_nerf_frame_fn(pc, pf or None, ncfg, vcfg, sampler,
                                      (ns.H, ns.W, ns.focal) if ns.ndc
                                      else None, ncfg_fine=ncfg_fine,
                                      perturb_test=args.perturb_test > 0,
                                      use_pallas=args.use_pallas)
        res = render_path(frame_fn, ns.poses[ns.i_test],
                          gt_images=ns.images[ns.i_test],
                          compute_flip=False, logger=logger)
        logger.print(f"teacher test PSNR {res.test_psnr:.4f}")

    if args.rm_existing_data and os.path.isdir(datadir_kd):
        # npz too: rand_images/patches modes write .npz batches — stale
        # old-teacher data must not survive an explicit wipe
        for f in os.listdir(datadir_kd):
            if (f.endswith((".npy", ".npz"))
                    and not f.startswith("train_")):
                os.remove(os.path.join(datadir_kd, f))

    n_pose = args.n_pose_kd if args.n_pose_kd else 100
    # Ray-record modes loop over a pose COUNT; only spiral takes the
    # [n_theta, n_phi, n_radius] grid list.
    if not isinstance(n_pose, int) and args.create_data != "spiral_evenly_spaced":
        raise SystemExit(f"--n_pose_kd must be an int for "
                         f"--create_data {args.create_data!r}; "
                         f"got {n_pose!r}")
    gcfg = DataGenConfig(
        n_pose=n_pose if isinstance(n_pose, int) else 1,
        H=ns.H, W=ns.W, focal=ns.focal,
        use_rand_focal=args.use_rand_focal,
        learn_depth=args.learn_depth,
        save_every=args.create_data_chunk, seed=args.seed,
        poses_per_batch=args.poses_per_batch,
        use_pallas=args.use_pallas,
        quantize=args.quantize, max_save=args.max_save)

    if args.create_data == "rand":
        from r2l_tpu.configs import parse_mesh_spec
        from r2l_tpu.parallel import make_mesh
        import jax
        mesh = (make_mesh(parse_mesh_spec(args.mesh))
                if (args.mesh or len(jax.devices()) > 1) else None)
        pose_fn = None
        if args.dataset_type == "llff":
            from r2l_tpu.data.llff import get_rand_pose_llff
            import numpy as _np
            hwf = _np.array([ns.H, ns.W, ns.focal], _np.float32)
            poses35 = _np.concatenate(
                [ns.poses, _np.broadcast_to(hwf.reshape(3, 1),
                                            (len(ns.poses), 3, 1))], -1)
            pose_fn = lambda r: get_rand_pose_llff(r, poses35)[:, :4]  # noqa: E731
        total = generate_pseudo_data(
            pc, pf or None, ncfg, vcfg, gcfg, datadir_kd, mesh=mesh,
            pose_fn=pose_fn, ndc=ns.ndc, ncfg_fine=ncfg_fine,
            progress=lambda i, n: (i % 50 == 0 and logger.print(
                f"pose {i}/{n}")))
        logger.print(f"generated {total} pseudo rays in {datadir_kd}")
    elif args.create_data == "spiral_evenly_spaced":
        n = generate_pseudo_images(pc, pf or None, ncfg, vcfg, gcfg,
                                   datadir_kd, n_pose=n_pose,
                                   ncfg_fine=ncfg_fine)
        logger.print(f"generated {n} pseudo images in {datadir_kd}")
    elif args.create_data == "rand_tworays":
        n = generate_tworays(pc, pf or None, ncfg, vcfg, gcfg, datadir_kd,
                             ncfg_fine=ncfg_fine)
        logger.print(f"generated {n} two-ray records in {datadir_kd}")
    elif args.create_data == "3x3rays":
        n = generate_3x3rays(pc, pf or None, ncfg, vcfg, gcfg, datadir_kd,
                             ncfg_fine=ncfg_fine)
        logger.print(f"generated {n} 3x3 records in {datadir_kd}")
    elif args.create_data == "rand_images":
        n = generate_rand_images(pc, pf or None, ncfg, vcfg, gcfg,
                                 datadir_kd, ncfg_fine=ncfg_fine)
        logger.print(f"generated {n} pseudo image records in {datadir_kd}")
    elif args.create_data in ("16x16patches", "16x16patches_v2",
                              "16x16patches_v3"):
        n = generate_patches(pc, pf or None, ncfg, vcfg, gcfg, datadir_kd,
                             ncfg_fine=ncfg_fine)
        logger.print(f"generated {n} patch frames in {datadir_kd}")
    else:
        raise SystemExit(f"unsupported --create_data {args.create_data!r} "
                         "(supported: rand, spiral_evenly_spaced, "
                         "rand_tworays, 3x3rays, rand_images, "
                         "16x16patches[_v2,_v3], convert_rays)")


if __name__ == "__main__":
    main()
