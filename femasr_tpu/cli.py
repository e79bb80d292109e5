"""Console-script entry points (pyproject `[project.scripts]`).

The repo-root shims (train.py/test.py, mirroring the reference's
root-level `basicsr.train` shims) pass the repo as the experiment root;
the installed commands use the invoking directory, so `femasr-train -opt
options/train_FeMaSR_LQ_stage.yml` writes `experiments/` under the
user's project the way the reference's `python basicsr/train.py` does.

Reference surface: /root/reference/setup.py (packaging),
/root/reference/basicsr/train.py:219 / test.py:40 (root_path wiring).
"""

import os

from femasr_tpu.train.pipeline import test_pipeline, train_pipeline


def train() -> None:
    train_pipeline(os.getcwd())


def test() -> None:
    test_pipeline(os.getcwd())
