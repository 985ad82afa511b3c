"""Import a reference pretrained checkpoint (``model.pth``) into a tracked run.

Creates a run in the local tracking store whose artifacts hold the converted
flax checkpoint, so ``eval_flow.py <runid>`` can evaluate reference weights
directly::

    python scripts/import_torch_checkpoint.py path/to/model.pth \
        [--path_mlflow DIR] [--config configs/train_flow.yml]

The train config is logged as run params so eval-time config reconstruction
(``merge_configs``) behaves exactly as with a run trained here.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taming_event_flow_tpu import tracking
from taming_event_flow_tpu.configs import YAMLParser
from taming_event_flow_tpu.tracking import (
    load_reference_torch_checkpoint,
    save_checkpoint,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="reference model.pth")
    parser.add_argument("--path_mlflow", default="")
    parser.add_argument("--config", default="configs/train_flow.yml")
    args = parser.parse_args()

    params = load_reference_torch_checkpoint(args.checkpoint)

    config = YAMLParser(args.config).config
    tracking.set_tracking_uri(args.path_mlflow)
    tracking.set_experiment(config.get("experiment", "Default"))
    run = tracking.start_run()
    tracking.log_params({k: str(v) for k, v in config.items()})
    save_checkpoint(run.info.run_id, params)
    tracking.end_run()
    print("Imported checkpoint into run:", run.info.run_id)


if __name__ == "__main__":
    main()
