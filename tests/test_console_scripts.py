"""Console-script wiring: every [project.scripts] target must resolve,
answer --help with SystemExit(0), and — because the generated wrapper runs
``sys.exit(target())`` — return a success exit status (0 or None), never an
informative value like a step count or an output path (which would make
every successful run exit nonzero)."""

import importlib
import re
from pathlib import Path

import pytest

PYPROJECT = Path(__file__).resolve().parent.parent / "pyproject.toml"


def _script_targets():
    section = PYPROJECT.read_text().split("[project.scripts]", 1)[1]
    section = section.split("[", 1)[0]
    return re.findall(r'(\S+)\s*=\s*"([\w.]+):(\w+)"', section)


def test_scripts_declared():
    assert len(_script_targets()) >= 10


@pytest.mark.parametrize("script,module,func", _script_targets())
def test_entry_point_resolves_and_help_exits_zero(script, module, func):
    target = getattr(importlib.import_module(module), func)
    assert callable(target), script
    with pytest.raises(SystemExit) as e:
        target(["--help"])
    assert e.value.code == 0, script


def test_cli_wrappers_return_success_status(tmp_path):
    """Targets whose main() returns data must be wrapped by a cli() that
    returns 0; spot-run one real command through a wrapper."""
    import json

    import jax

    from pose3d_tpu.cli import convert, evaluate, export, infer
    from pose3d_tpu.cli import main as train_cli
    from pose3d_tpu.cli import preprocess, rechunker, split
    from pose3d_tpu.core.config import CNNModelConfig
    from pose3d_tpu.models import init_model
    from pose3d_tpu.train import create_train_state
    from pose3d_tpu.train.checkpoint import save_checkpoint

    for mod in (train_cli, infer, preprocess, rechunker, split, evaluate,
                export):
        assert hasattr(mod, "cli"), mod.__name__

    kw = dict(image_size=[32, 32], heatmap_size=32, heatmap_sigma=2.0,
              stage_channels=[8, 16, 32], stage_depths=[1, 1, 1],
              initial_channels=8, global_pool_size=2, global_feature_dim=16,
              regression_dims=[16])
    cfg = CNNModelConfig.from_dict({**kw, "in_channels": 21})
    model, variables = init_model(cfg, batch_size=1)
    state = create_train_state(model, variables)
    ck = save_checkpoint(tmp_path / "ckpt", state, "cnn",
                         json.loads(json.dumps(kw)))
    assert convert.main(
        [str(ck), str(tmp_path / "o.pth"), "--to-torch"]
    ) == 0
    assert export.cli(["--checkpoint", str(ck),
                       "--output", str(tmp_path / "art"),
                       "--batch-size", "1"]) == 0
    del jax  # imported for device warmup ordering only


def test_doctor_report(tmp_path):
    """pose3d-doctor produces a complete report and exits 0 (probes off:
    they compile device programs and belong to manual runs)."""
    import json

    from pose3d_tpu.cli import doctor

    out = tmp_path / "doctor.json"
    rep = doctor.main(["--json", str(out)])
    assert rep["versions"]["jax"] != "NOT INSTALLED"
    assert rep["devices"]["device_count"] >= 1
    assert isinstance(rep["native"]["decoder_available"], bool)
    assert "console_scripts_missing" in rep["install"]
    assert json.loads(out.read_text())["versions"]["python"]
    assert doctor.cli([]) == 0
