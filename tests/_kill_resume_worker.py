"""Worker for tests/test_kill_resume.py: one real CLI training process
(run_slot_finetuning) on an 8-virtual-device CPU mesh, argv passed
through. Run as a separate OS process so the parent test can SIGKILL it
mid-training and then relaunch it to exercise --auto_resume exactly the
way a preempted job would (ref utils/utils.py:467-517 semantics).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

from devias_tpu.cli.run_slot_finetuning import get_args, main

if __name__ == "__main__":
    main(get_args(sys.argv[1:]))
