"""Alias entry point: the reference README names the trainer `training.py`
(a renamed twin of finetune_sd.py, SURVEY.md §2.1 note).  Same CLI here."""
from sdbc_tpu.cli.finetune import build_parser, main

if __name__ == "__main__":
    main()
