"""Experiment tracking: local JSONL always, wandb when available + keyed.

Replaces the reference's wandb-exclusive logging (SURVEY.md C16:
init/config/tags at finetune_sd.py:348-356, scalar logs :501-504/:577-580,
image logs inference.py:377-382, hyperparams.json dump :473-475).  All wandb
use in the reference is gated on --wandb_key; here wandb is additionally
optional at import time (it is not installed in the TPU image), and every run
always gets a local ``events.jsonl`` + ``hyperparams.json`` so nothing is
lost offline.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class Tracker:
    def __init__(self, output_dir: str, run_id: str,
                 config: Optional[dict] = None,
                 wandb_key: Optional[str] = None,
                 project: str = "sdbc-tpu", tags=()):
        self.dir = os.path.join(output_dir, "runs", run_id)
        os.makedirs(self.dir, exist_ok=True)
        self.events_path = os.path.join(self.dir, "events.jsonl")
        self._events = open(self.events_path, "a")
        if config:
            with open(os.path.join(self.dir, "hyperparams.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)

        self.wandb = None
        if wandb_key:
            try:
                import wandb

                wandb.login(key=wandb_key)
                self.wandb = wandb.init(project=project, id=run_id,
                                        config=config or {}, tags=list(tags),
                                        resume="allow")
            except ImportError:
                print("wandb not installed; logging locally only")
            except Exception as e:  # auth/network failures must not kill
                # the run — the module contract is "local JSONL always"
                print(f"wandb init failed ({e}); logging locally only")
                self.wandb = None

    def log(self, metrics: dict, step: Optional[int] = None) -> None:
        rec = {"ts": time.time(), **({"step": step} if step is not None else {}),
               **{k: float(v) for k, v in metrics.items()}}
        self._events.write(json.dumps(rec) + "\n")
        self._events.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def log_image(self, name: str, path: str, step: Optional[int] = None) -> None:
        self.log({f"image/{name}": 1.0}, step)
        if self.wandb is not None:
            import wandb

            self.wandb.log({name: wandb.Image(path)}, step=step)

    def log_artifact(self, path: str, name: str = "stable_diffusion_model",
                     type_: str = "model") -> None:
        """Checkpoint-dir upload (reference finetune_sd.py:541-545); local-only
        runs record the path in the event log instead."""
        self.log({"artifact_saved": 1.0})
        if self.wandb is not None:
            import wandb

            art = wandb.Artifact(name, type=type_)
            art.add_dir(path)
            self.wandb.log_artifact(art)

    @staticmethod
    def download_artifact(run_id: str, wandb_key: str,
                          name: str = "stable_diffusion_model",
                          version: str = "latest",
                          project: str = "sdbc-tpu") -> str:
        """Artifact download for resume (reference utils.py:232-253)."""
        try:
            import wandb
        except ImportError as e:
            raise RuntimeError(
                "wandb is not installed in this environment; resume from a "
                "local checkpoint dir instead (--ckpt)") from e
        wandb.login(key=wandb_key)
        run = wandb.init(project=project, id=run_id, resume="must")
        art = run.use_artifact(f"{name}:{version}")
        return art.download()

    def finish(self) -> None:
        self._events.close()
        if self.wandb is not None:
            self.wandb.finish()
