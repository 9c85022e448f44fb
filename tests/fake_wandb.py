"""Filesystem-backed fake ``wandb`` module for offline artifact tests.

wandb is not installed in this image, so utils/tracking.py's artifact
up/download branch (the reference's wandb store, finetune_sd.py:541-545 /
utils.py:232-253) could never execute in the suite.  This fake implements
exactly the surface Tracker touches — login / init / Artifact / Image /
run.log / run.log_artifact / run.use_artifact / art.download — with a
directory registry providing real version tags (v0, v1, ...) and
``:latest`` resolution.

Usage (see test_wandb_artifacts.py): point ``STORE_DIR`` at a tmp dir and
insert this module as ``sys.modules["wandb"]`` before Tracker runs.
"""
from __future__ import annotations

import os
import shutil

# test sets this to a tmp dir before use
STORE_DIR = ""

_logged_in = []


def _store():
    if not STORE_DIR:
        raise RuntimeError("fake_wandb.STORE_DIR is unset")
    os.makedirs(STORE_DIR, exist_ok=True)
    return STORE_DIR


def login(key=None, **kw):
    _logged_in.append(key)


class Image:
    def __init__(self, path):
        self.path = path


class Artifact:
    def __init__(self, name, type=None):
        self.name = name
        self.type = type
        self._dirs = []

    def add_dir(self, path):
        self._dirs.append(path)


class _DownloadedArtifact:
    def __init__(self, version_dir):
        self._dir = version_dir

    def download(self):
        return self._dir


class _Run:
    def __init__(self, project, id=None, config=None, tags=(), resume=None):
        self.project = project
        self.id = id
        self.config = dict(config or {})
        self.tags = list(tags)
        self.resume = resume
        self.history = []
        self.finished = False

    def log(self, metrics, step=None):
        self.history.append({"step": step, **metrics})

    def _art_root(self, name):
        return os.path.join(_store(), self.project, name)

    def log_artifact(self, art: Artifact):
        root = self._art_root(art.name)
        os.makedirs(root, exist_ok=True)
        n = len([d for d in os.listdir(root) if d.startswith("v")])
        vdir = os.path.join(root, f"v{n}")
        os.makedirs(vdir)
        for d in art._dirs:
            for entry in os.listdir(d):
                src = os.path.join(d, entry)
                dst = os.path.join(vdir, entry)
                (shutil.copytree if os.path.isdir(src)
                 else shutil.copy2)(src, dst)
        return vdir

    def use_artifact(self, ref: str):
        name, _, version = ref.partition(":")
        root = self._art_root(name)
        if not os.path.isdir(root):
            raise ValueError(f"fake wandb: no artifact {ref!r}")
        versions = sorted((d for d in os.listdir(root)
                           if d.startswith("v")),
                          key=lambda d: int(d[1:]))
        if version in ("latest", ""):
            pick = versions[-1]
        elif version in versions:
            pick = version
        else:
            raise ValueError(f"fake wandb: no version {version!r} of "
                             f"{name!r} (have {versions})")
        return _DownloadedArtifact(os.path.join(root, pick))

    def finish(self):
        self.finished = True


_runs = []


def init(project="default", **kw):
    run = _Run(project, **kw)
    _runs.append(run)
    return run
