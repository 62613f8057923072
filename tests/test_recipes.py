"""Recipe validation: every script in recipes/ must (a) be valid bash and
(b) produce a flag set its CLI parser accepts — checked by running each
recipe with a stub `python` that imports the target module and
parse_args()'s the flags instead of training (full SMOKE=1 execution is
exercised separately on hardware; see RESULTS.md)."""
import os
import stat
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RECIPES = os.path.join(REPO, "recipes")

STUB = """#!{python}
import importlib, os, sys
sys.path.insert(0, os.getcwd())  # `python -m` semantics
args = sys.argv[1:]
if args and args[0] == "-u":
    args = args[1:]
assert args[0] == "-m", args
mod = importlib.import_module(args[1])
parser = mod.get_parser()
parser.parse_args(args[2:])
print("PARSE_OK", args[1])
"""

ALL_RECIPES = [
    ("detect_voc07_baseline.sh", []),
    ("detect_voc07_final_setting1.sh", []),
    ("detect_voc07_final_setting2.sh", []),
    ("detect_voc07_final_setting3.sh", []),
    ("detect_coco_final_setting.sh", ["1"]),
    ("detect_coco_final_setting.sh", ["4"]),
    ("detect_coco_final_setting.sh", ["6"]),
    ("seg_city_final.sh", ["1"]),
    ("seg_city_final.sh", ["2"]),
    ("seg_voc12_final50.sh", ["1"]),
    ("seg_voc12_final50.sh", ["4"]),
    ("seg_voc07_final1.sh", []),
    ("classify_base.sh", []),
    ("classify_alfa.sh", []),
]


def test_bash_syntax():
    scripts = [f for f in os.listdir(RECIPES) if f.endswith(".sh")]
    assert len(scripts) >= 10
    for f in scripts:
        subprocess.run(["bash", "-n", os.path.join(RECIPES, f)], check=True)


@pytest.mark.slow
@pytest.mark.parametrize("script,args", ALL_RECIPES,
                         ids=[f"{s}-{'_'.join(a) or 'x'}"
                              for s, a in ALL_RECIPES])
def test_recipe_flags_parse(tmp_path, script, args):
    stub = tmp_path / "python"
    stub.write_text(STUB.format(python=sys.executable))
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    env = dict(os.environ)
    env["PATH"] = f"{tmp_path}:{env['PATH']}"
    env["SMOKE"] = "1"
    # the train_classify parser lives behind get_parser in every CLI the
    # recipes invoke; a parse failure exits non-zero
    out = subprocess.run(
        ["bash", os.path.join(RECIPES, script)] + args, env=env, cwd=REPO,
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "PARSE_OK" in out.stdout


SMOKE_RECIPES = [
    # one per stack: train -> checkpoint -> eval, real execution on CPU
    ("classify_alfa.sh", [], "best val accuracy"),
    ("detect_voc07_final_setting1.sh", [], "final mAP"),
    ("seg_city_final.sh", ["1"], "best mIoU"),
]


@pytest.mark.slow
@pytest.mark.parametrize("script,args,marker", SMOKE_RECIPES,
                         ids=[s for s, _, _ in SMOKE_RECIPES])
def test_recipe_executes_end_to_end(tmp_path, script, args, marker):
    """SMOKE_TINY=1 EXECUTION (not just flag parsing): a recipe that
    parses can still crash at step 1 on a bad flag combination; each
    stack's flagship recipe must actually train, checkpoint, and eval."""
    env = dict(os.environ)
    env["SMOKE_TINY"] = "1"
    env["AFAN_PLATFORM"] = "cpu"   # honored by afan/__init__ post-import
    env["OUT"] = str(tmp_path / "out")
    env.pop("XLA_FLAGS", None)     # single CPU device is enough
    out = subprocess.run(
        ["bash", os.path.join(RECIPES, script)] + args, env=env, cwd=REPO,
        capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stdout[-4000:] + out.stderr[-4000:]
    assert marker in out.stdout + out.stderr, out.stdout[-4000:]
