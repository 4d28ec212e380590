"""Generates the API reference (docs/api/*.md) from docstrings.

The reference documents its public API with Sphinx autodoc
(reference docs/modules/*.rst); this is the dependency-free analogue:
one markdown page per public module, with signatures and docstrings of
every name the module exports (``__all__``, else public attributes
defined in the module).

Usage: python tools/gen_api_docs.py
"""

import importlib
import inspect
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
OUT = ROOT / "docs" / "api"

MODULES = [
    "gradslam_tpu.geometry.projutils",
    "gradslam_tpu.geometry.geometryutils",
    "gradslam_tpu.geometry.se3",
    "gradslam_tpu.structures.pointclouds",
    "gradslam_tpu.structures.rgbdimages",
    "gradslam_tpu.structures.maparena",
    "gradslam_tpu.structures.utils",
    "gradslam_tpu.structures.structutils",
    "gradslam_tpu.odometry.base",
    "gradslam_tpu.odometry.groundtruth",
    "gradslam_tpu.odometry.icp",
    "gradslam_tpu.odometry.gradicp",
    "gradslam_tpu.odometry.icputils",
    "gradslam_tpu.slam.icpslam",
    "gradslam_tpu.slam.pointfusion",
    "gradslam_tpu.slam.fusionutils",
    "gradslam_tpu.slam.lifecycle",
    "gradslam_tpu.slam.loopclosure",
    "gradslam_tpu.ops.knn",
    "gradslam_tpu.ops.masking",
    "gradslam_tpu.ops.voxel",
    "gradslam_tpu.datasets.tum",
    "gradslam_tpu.datasets.icl",
    "gradslam_tpu.datasets.scannet",
    "gradslam_tpu.datasets.datautils",
    "gradslam_tpu.datasets.dataloader",
    "gradslam_tpu.datasets.synth",
    "gradslam_tpu.parallel.mesh",
    "gradslam_tpu.parallel.sharded",
    "gradslam_tpu.parallel.seqpar",
    "gradslam_tpu.parallel.pipeline",
    "gradslam_tpu.parallel.pose_refine",
    "gradslam_tpu.parallel.multihost",
    "gradslam_tpu.metrics.trajectory",
    "gradslam_tpu.metrics.reconstruction",
    "gradslam_tpu.utils.checkpoint",
    "gradslam_tpu.utils.profiling",
    "gradslam_tpu.utils.devices",
    "gradslam_tpu.config.cfgnode",
    "gradslam_tpu.viz",
    "gradslam_tpu.viz.ply",
]


def public_names(mod):
    if hasattr(mod, "__all__"):
        return list(mod.__all__)
    return [
        n
        for n, v in vars(mod).items()
        if not n.startswith("_")
        and getattr(v, "__module__", None) == mod.__name__
    ]


def fmt_signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def doc_of(obj):
    d = inspect.getdoc(obj)
    return d.strip() if d else "*(no docstring)*"


def render_module(modname):
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    mdoc = inspect.getdoc(mod)
    if mdoc:
        lines += [mdoc.strip(), ""]
    for name in public_names(mod):
        obj = getattr(mod, name, None)
        if obj is None:
            continue
        if inspect.isclass(obj):
            lines += [f"## class `{name}{fmt_signature(obj)}`", ""]
            lines += [doc_of(obj), ""]
            for mname, meth in inspect.getmembers(obj):
                if mname.startswith("_") or not (
                    inspect.isfunction(meth) or isinstance(
                        inspect.getattr_static(obj, mname, None), property
                    )
                ):
                    continue
                owner = getattr(meth, "__qualname__", "")
                if not owner.startswith(obj.__name__ + "."):
                    continue  # inherited
                sig = fmt_signature(meth)
                lines += [f"### `{name}.{mname}{sig}`", ""]
                lines += [doc_of(meth), ""]
            for pname, prop in vars(obj).items():
                if pname.startswith("_") or not isinstance(prop, property):
                    continue
                lines += [f"### property `{name}.{pname}`", ""]
                lines += [doc_of(prop.fget) if prop.fget else "", ""]
        elif callable(obj):
            fn = getattr(obj, "__wrapped__", obj)
            lines += [f"## `{name}{fmt_signature(fn)}`", ""]
            lines += [doc_of(obj), ""]
        else:
            lines += [f"## `{name}`", "", doc_of(obj), ""]
    return "\n".join(lines) + "\n"


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    index = [
        "# gradslam-tpu API reference",
        "",
        "Generated from docstrings by `tools/gen_api_docs.py` "
        "(regenerate after signature changes).",
        "",
    ]
    for modname in MODULES:
        page = modname.replace("gradslam_tpu.", "").replace(".", "_") + ".md"
        try:
            text = render_module(modname)
        except Exception as e:  # viz modules may lack optional deps
            text = f"# `{modname}`\n\n*(import failed: {e})*\n"
        (OUT / page).write_text(text)
        index.append(f"- [`{modname}`]({page})")
    (OUT / "index.md").write_text("\n".join(index) + "\n")
    print(f"wrote {len(MODULES) + 1} pages to {OUT}")


if __name__ == "__main__":
    main()
