"""Local tracker: JSONL events, hyperparams dump, artifact logging (no wandb)."""
import json
import os

from sdbc_tpu.utils.tracking import Tracker


def test_events_and_hyperparams(tmp_path):
    t = Tracker(str(tmp_path), "runx", config={"lr": 5e-6, "epochs": 2})
    t.log({"loss": 1.5}, step=1)
    t.log({"loss": 1.25, "mean_loss": 1.4}, step=2)
    t.log_artifact(str(tmp_path))
    t.finish()

    run_dir = tmp_path / "runs" / "runx"
    with open(run_dir / "hyperparams.json") as f:
        hp = json.load(f)
    assert hp["lr"] == 5e-6
    events = [json.loads(l) for l in open(run_dir / "events.jsonl")]
    assert events[0]["loss"] == 1.5 and events[0]["step"] == 1
    assert events[1]["mean_loss"] == 1.4
    assert any("artifact_saved" in e for e in events)


def test_wandb_absent_is_graceful(tmp_path):
    # wandb is not installed in this image; a key must not crash the run
    t = Tracker(str(tmp_path), "runy", config={}, wandb_key="fake-key")
    assert t.wandb is None
    t.log({"x": 1.0})
    t.finish()


def test_download_artifact_without_wandb_raises():
    import pytest

    try:
        import wandb  # noqa: F401

        pytest.skip("wandb installed")
    except ImportError:
        pass
    import pytest

    with pytest.raises(RuntimeError, match="local checkpoint"):
        Tracker.download_artifact("run", "key")
