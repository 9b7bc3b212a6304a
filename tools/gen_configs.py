"""Generate the 57 scene config files into configs/.

The reference ships 57 `configs/*.txt` scene files (templates per dataset
family — see `/root/reference/configs/lego.txt` for the blender shape,
`fern.txt` for LLFF) that every README command consumes via ``--config``.
This generator re-emits the same scene/variant matrix for this CLI
(`r2l_tpu/configs.py` reads the identical key = value format):

  blender x {base, _800x800, _noview, _noview_800x800}   8 scenes -> 32
  donerf_<scene>_noview                                   6 scenes ->  6
  llff x {base, _noview}                                  8 scenes -> 16
  specials: lego_usebatching, hotdog_yenchenlin,
            materials_yenchenlin                                    ->  3

Run: python tools/gen_configs.py  (idempotent; writes repo-root configs/)
"""
from __future__ import annotations

import os

BLENDER = ["chair", "drums", "ficus", "hotdog", "lego", "materials", "mic",
           "ship"]
DONERF = ["barbershop", "bulldozer", "classroom", "forest", "pavillon",
          "sanmiguel"]
LLFF = ["fern", "flower", "fortress", "horns", "leaves", "orchids", "room",
        "trex"]

HEADER = ("# Scene config for r2l_tpu (reference-parity key = value format;"
          "\n# parsed by r2l_tpu/configs.py — flags may also be overridden"
          " on the CLI).\n")


def blender_cfg(scene: str, datadir: str, expname: str, *, viewdirs: bool,
                half_res: bool, batching: bool = False) -> str:
    lines = [
        HEADER,
        f"expname = {expname}",
        "basedir = ./logs",
        f"datadir = {datadir}",
        "dataset_type = blender",
        "",
        # use_batching mode keeps the flag line visible but commented, as
        # the reference's lego_usebatching.txt does.
        "# no_batching = True" if batching else "no_batching = True",
        "",
        f"use_viewdirs = {viewdirs}"
        + ("" if viewdirs else "  # the R2L student needs no viewdirs"),
        "white_bkgd = True",
        "lrate_decay = 500",
        "",
        "N_samples = 64",
        "N_importance = 128",
        "N_rand = 1024",
        "",
        "precrop_iters = 500",
        "precrop_frac = 0.5",
        "",
        f"half_res = {half_res}",
        "",
    ]
    return "\n".join(lines)


def llff_cfg(scene: str, datadir: str, *, viewdirs: bool,
             no_batching: bool = False) -> str:
    lines = [
        HEADER,
        f"expname = {scene}_test",
        "basedir = ./logs",
        f"datadir = {datadir}",
        "dataset_type = llff",
        "",
        "factor = 8",
        "llffhold = 8",
        "",
        "N_rand = 1024",
        "N_samples = 64",
        "N_importance = 64",
        "",
        f"use_viewdirs = {viewdirs}"
        + ("" if viewdirs else "  # the R2L student needs no viewdirs"),
        "raw_noise_std = 1e0",
        "",
    ]
    if no_batching:
        lines += ["no_batching = True  # rays mode, as with the synthetic "
                  "scenes", ""]
    return "\n".join(lines)


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    os.makedirs(out_dir, exist_ok=True)
    files: dict[str, str] = {}

    for s in BLENDER:
        dd = f"./data/nerf_synthetic/{s}"
        exp = f"blender_paper_{s}"
        files[f"{s}.txt"] = blender_cfg(s, dd, exp, viewdirs=True,
                                        half_res=True)
        files[f"{s}_800x800.txt"] = blender_cfg(s, dd, exp, viewdirs=True,
                                                half_res=False)
        files[f"{s}_noview.txt"] = blender_cfg(s, dd, exp, viewdirs=False,
                                               half_res=True)
        files[f"{s}_noview_800x800.txt"] = blender_cfg(
            s, dd, exp, viewdirs=False, half_res=False)

    files["lego_usebatching.txt"] = blender_cfg(
        "lego", "./data/nerf_synthetic/lego", "blender_paper_lego",
        viewdirs=True, half_res=True, batching=True)

    for s in DONERF:
        files[f"donerf_{s}_noview.txt"] = blender_cfg(
            s, f"./data/donerf_data/{s}", f"donerf_paper_{s}",
            viewdirs=False, half_res=True)

    for s in LLFF:
        dd = f"./data/nerf_llff_data/{s}"
        files[f"{s}.txt"] = llff_cfg(s, dd, viewdirs=True)
        files[f"{s}_noview.txt"] = llff_cfg(s, dd, viewdirs=False,
                                            no_batching=True)

    # The reference's hotdog/materials "yenchenlin" variants point the LLFF
    # pipeline at those scenes (`hotdog_yenchenlin.txt`).
    for s in ("hotdog", "materials"):
        files[f"{s}_yenchenlin.txt"] = llff_cfg(
            s, f"./data/nerf_llff_data/{s}", viewdirs=True)

    for name, text in sorted(files.items()):
        with open(os.path.join(out_dir, name), "w") as f:
            f.write(text)
    print(f"wrote {len(files)} configs to {out_dir}")


if __name__ == "__main__":
    main()
