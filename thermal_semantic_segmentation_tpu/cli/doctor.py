"""Environment / dataset / checkpoint sanity checker.

The most common migration failures are a mislaid dataset tree (the
reference's list-file grammar is strict: train/seq_*/NN/fl_ir_aligned +
fl_rgb + fl_rgb_labels siblings, test/day|night/ImagesIR + .npy labels —
/root-reference utils/misc.py freiburg_txt:236, data/freiburg_dataset.py)
and checkpoints of the wrong schema. ``doctor`` constructs the REAL
dataset classes and checkpoint loaders against your flags and reports
PASS/WARN/FAIL per surface, so the error shows up here with a message
instead of three stages into a pipeline run.

    python -m thermal_semantic_segmentation_tpu.cli.doctor \
        --freiburg_root datasets/freiburg -checkpoint_name s.pth

Exit status: 0 when nothing FAILs (WARNs allowed), 1 otherwise.
"""

from __future__ import annotations

import os
import subprocess
import sys

# repo checkout root (parent of the package dir) — only meaningful when
# running from a source tree; recipes/ lives there, not in site-packages
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


class _Report:
    def __init__(self):
        self.failed = False

    def ok(self, what, detail=""):
        print(f"  PASS  {what}" + (f" — {detail}" if detail else ""))

    def warn(self, what, detail=""):
        print(f"  WARN  {what}" + (f" — {detail}" if detail else ""))

    def fail(self, what, detail=""):
        self.failed = True
        print(f"  FAIL  {what}" + (f" — {detail}" if detail else ""))


def _check_backend(rep: _Report, timeout_s: int = 120):
    """Probe the JAX backend in a SUBPROCESS (a failed in-process init can
    wedge the runtime — docs/OPERATIONS.md backend-selection notes)."""
    # import the package first so TSS_PLATFORM=cpu is honored in the probe
    code = ("import thermal_semantic_segmentation_tpu, jax, json; "
            "d = jax.devices(); "
            "print(json.dumps({'platform': d[0].platform, 'n': len(d)}))")
    env = {**os.environ}
    env["PYTHONPATH"] = os.pathsep.join(
        [_REPO_ROOT] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           timeout=timeout_s, text=True, env=env)
    except subprocess.TimeoutExpired:
        rep.fail("backend", f"no answer in {timeout_s}s (tunnel down? "
                            "try TSS_PLATFORM=cpu for host-only work)")
        return
    if r.returncode == 0:
        import json
        info = json.loads(r.stdout.strip().splitlines()[-1])
        rep.ok("backend", f"{info['n']} x {info['platform']}")
    else:
        tail = (r.stderr or "").strip().splitlines()[-1:] or ["?"]
        rep.fail("backend", tail[0])


def _check_dataset(rep: _Report, name: str, build):
    try:
        ds = build()
        n = len(ds)
        if n == 0:
            rep.fail(name, "constructed but EMPTY (0 samples) — check the "
                           "tree layout against docs/MIGRATION.md")
        else:
            # actually load one sample: catches unreadable/mislabeled files
            ds.get(0, __import__("numpy").random.default_rng(0))
            rep.ok(name, f"{n} samples, sample 0 loads")
    except FileNotFoundError as e:
        rep.fail(name, f"missing path: {e}")
    except Exception as e:
        rep.fail(name, f"{type(e).__name__}: {e}")


def _check_freiburg(rep: _Report, args):
    root = args.freiburg_root
    if not os.path.isdir(root):
        rep.warn("freiburg root", f"{root} does not exist — skipping "
                                  "dataset checks (pass --freiburg_root)")
        return
    from ..data import transforms as T
    from ..data.freiburg import Freiburg, FreiburgTest
    tf = T.Compose([T.Resize((128, 64)), T.ToArray()])
    _check_dataset(rep, "freiburg train IR", lambda: Freiburg(
        root, "train", "IR", transforms=tf, with_label=True))
    _check_dataset(rep, "freiburg train RGB", lambda: Freiburg(
        root, "train", "RGB", transforms=tf, with_label=True))
    _check_dataset(rep, "freiburg test IR", lambda: FreiburgTest(
        root, "test", "IR", transforms=tf, with_label=True))
    tname = getattr(args, "translation_name", "") or ""
    if tname:
        tdir = os.path.join(root, tname)
        if os.path.isdir(tdir):
            _check_dataset(rep, f"translated source ({tname})",
                           lambda: Freiburg(root, "train", "RGB",
                                            transforms=tf, with_label=True,
                                            translation_name=tname))
        else:
            rep.warn(f"translated source ({tname})",
                     f"{tdir} absent — run cli.translator first if the seg "
                     "recipe expects translated frames")


def _check_tree_grammar(rep: _Report, args):
    """Audit a mounted Freiburg tree against the reference list-file grammar
    (utils/misc.py freiburg_txt:236-278, data/freiburg_dataset.py) at the
    FILE level: the dataset constructors above prove 'loadable', this names
    exactly which sibling derivations are broken when they are not.

    Returns True when the tree can drive the full recipe (train IR+RGB with
    label siblings and the day test split all present and paired). The
    enumeration + label derivation comes from data/list_files.freiburg_pairs
    — the SAME code the dataset loaders use, so the audit cannot drift from
    the grammar it audits."""
    from ..data.list_files import freiburg_pairs

    root = args.freiburg_root
    if not os.path.isdir(root):
        return False

    ready = True

    def audit(name, pairs):
        nonlocal ready
        if not pairs:
            rep.fail(f"grammar: {name}", "matched NOTHING — tree does "
                     "not follow the reference layout (docs/MIGRATION.md)")
            ready = False
            return
        missing = [(f, d) for f, d in pairs if not os.path.exists(d)]
        if missing:
            ex = "; ".join(f"{os.path.relpath(f, root)} -> "
                           f"{os.path.relpath(d, root)}"
                           for f, d in missing[:3])
            rep.fail(f"grammar: {name}",
                     f"{len(missing)}/{len(pairs)} label siblings missing, "
                     f"e.g. {ex}")
            ready = False
        else:
            rep.ok(f"grammar: {name}", f"{len(pairs)} frames, all label "
                   f"siblings present")

    for time in ("day",):
        ir = freiburg_pairs(root, "train", "IR", time)
        audit(f"train IR ({time})", ir)
        rgb = freiburg_pairs(root, "train", "RGB", time)
        audit(f"train RGB ({time})", rgb)
        if ir and rgb and len(ir) != len(rgb):
            rep.warn(f"train pairing ({time})",
                     f"{len(ir)} IR vs {len(rgb)} RGB frames (the GAN "
                     "loaders zip lockstep; unequal counts just truncate)")
        audit(f"test IR ({time})", freiburg_pairs(root, "test", "IR", time))
    return ready


def _emit_recipe(args, ready: bool):
    """Print the exact full-recipe command for the mounted tree — the
    north-star run (reference self_train_main.py:53 mIoU threshold 0.52)
    should launch unattended the day real data mounts (VERDICT r4 #6)."""
    root = os.path.abspath(args.freiburg_root)
    print()
    if not ready:
        print("recipe: tree NOT ready — fix the FAILs above, then re-run "
              "doctor to get the launch command.")
        return
    # full_pipeline.sh resolves the repo itself but must run from a working
    # directory that CONTAINS datasets/freiburg (the CLIs' default root), so
    # emit an absolute script path plus the right cd / symlink preamble.
    script = os.path.join(_REPO_ROOT, "recipes", "full_pipeline.sh")
    if not os.path.isfile(script):
        # pip-installed package: recipes/ is not shipped into site-packages
        script = "<your-checkout>/recipes/full_pipeline.sh"
    suffix = os.sep + os.path.join("datasets", "freiburg")
    if root.endswith(suffix):
        workdir = root[: -len(suffix)] or os.sep
        cd = (f"cd {workdir} && "
              if os.path.abspath(os.getcwd()) != workdir else "")
    else:
        print(f"recipe: the pipeline CLIs default to datasets/freiburg; "
              f"from your chosen working directory link the tree first:  "
              f"mkdir -p datasets && ln -s {root} datasets/freiburg")
        cd = ""
    print("recipe: tree is ready. Full adaptation pipeline with the "
          "reference's own save threshold as the gate:")
    print(f"  {cd}MIN_MIOU=0.52 {script}")
    print("  (add SEM_S=<rgb_seg.pth> SEM_T=<ir_seg.pth> for translation-"
          "fidelity losses once per-domain seg checkpoints exist; "
          "see recipes/full_pipeline.sh header)")


def _check_checkpoint(rep: _Report, args):
    name = getattr(args, "checkpoint_name", "") or ""
    if not name:
        return
    path = os.path.join(args.model_root_path, name)
    if not os.path.exists(path):
        rep.warn("seg checkpoint", f"{path} absent")
        return
    try:
        from ._common import load_seg_checkpoint
        variables, meta = load_seg_checkpoint(path)
        import jax
        n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
        rep.ok("seg checkpoint",
               f"{name}: {n_params / 1e6:.1f}M params, meta "
               f"{ {k: v for k, v in meta.items() if k != 'objective_vectors'} }")
    except Exception as e:
        rep.fail("seg checkpoint", f"{type(e).__name__}: {e}")


def _check_native(rep: _Report):
    from ..data import native_loader as nl
    if nl.available():
        rep.ok("native C++ IO", "libtss_io loaded")
    else:
        rep.warn("native C++ IO", "libtss_io.so unavailable (auto-build "
                 "needs g++ with libpng/libjpeg headers) — PIL fallback "
                 "works; the native path wins on multi-core hosts")


def _check_compile_cache(rep: _Report, args):
    cc = getattr(args, "compile_cache_dir", "")
    if not cc:
        rep.warn("compile cache", "disabled — every fresh process pays the "
                 "full XLA compile (minutes for the GAN step over a "
                 "tunneled backend)")
        return
    from ..core.compile_cache import _DISABLE, default_cache_dir
    d = default_cache_dir() if cc == "auto" else cc
    if d.strip().lower() in _DISABLE:
        # 'auto' can resolve to disabled via TSS_COMPILE_CACHE_DIR="" etc.;
        # report the truth instead of PASS-with-an-empty-path
        rep.warn("compile cache", f"resolved to disabled ({d!r}) — every "
                 "fresh process pays the full XLA compile")
        return
    if not os.path.isdir(d):
        rep.ok("compile cache", f"{d} (empty — fills on first compiles)")
        return
    # JAX writes entries as temp files then renames: scan defensively so a
    # concurrent compile can't vanish a name mid-stat and crash the report
    n_entries, total = 0, 0
    with os.scandir(d) as it:
        for e in it:
            try:
                if e.is_file():
                    n_entries += 1
                    total += e.stat().st_size
            except FileNotFoundError:
                continue
    rep.ok("compile cache", f"{d}: {n_entries} entries, "
           f"{total / 2**20:.1f} MB")


def doctor_parse():
    from .options import HostConfigParser, _add_roots, str2bool
    p = HostConfigParser(description="environment/dataset sanity checks")
    p.add_argument("-checkpoint_name", type=str, default="")
    p.add_argument("-translation_name", type=str, default="")
    p.add_argument("--check_backend", type=str2bool, default=True,
                   help="probe jax.devices() in a subprocess (off for "
                        "pure host-side checks)")
    _add_roots(p)
    return p


def main(argv=None):
    args = doctor_parse().parse_args(argv)
    rep = _Report()
    print("doctor:")
    if args.check_backend:
        _check_backend(rep)
    _check_freiburg(rep, args)
    ready = _check_tree_grammar(rep, args)
    _check_checkpoint(rep, args)
    _check_native(rep)
    _check_compile_cache(rep, args)
    print("doctor: FAIL" if rep.failed else "doctor: ok")
    if os.path.isdir(args.freiburg_root):
        _emit_recipe(args, ready and not rep.failed)
    return 1 if rep.failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
