"""End-to-end drive of graceful preemption through the real train CLI.

Spawns `allophant_tpu.cli.run train` as a subprocess on a tiny synthetic
Common Voice corpus, sends SIGTERM mid-training, and asserts:
1. the process exits cleanly (rc 0) after checkpointing,
2. the interrupted checkpoint exists and carries optimizer state,
3. a `--restore` resume prefers it and completes training.

Usage: JAX_PLATFORMS=cpu python tools/drive_sigterm_train.py (~4 min on one
CPU core; the 75 s sleep covers corpus setup + the first jit compile so the
signal lands mid-training).
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from fixtures import build_cv_corpus, mini_allophoible_csv, mini_config_dict

root = tempfile.mkdtemp(prefix="sigterm_drive_")
corpus_root = os.path.join(root, "cv")
os.makedirs(corpus_root)
build_cv_corpus(corpus_root)

attribute_path = os.path.join(root, "features.csv")
with open(attribute_path, "w", encoding="utf-8") as file:
    file.write(mini_allophoible_csv())

config = mini_config_dict()
config["nn"]["batch_size"] = 2
config["nn"]["maximum_iterations"] = 200  # long enough to interrupt mid-run
config["data"]["languages"] = ["es", "it"]

save_path = os.path.join(root, "model.ckpt")
env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo"}
args = [
    sys.executable, "-m", "allophant_tpu.cli.run", "train", corpus_root,
    "--cpu", "--no-progress", "-j", json.dumps(config), "-a", attribute_path,
    "-s", save_path,
]
proc = subprocess.Popen(args, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
# Let it get through setup + a few steps (tiny model on CPU), then preempt.
time.sleep(75)
proc.send_signal(signal.SIGTERM)
out, _ = proc.communicate(timeout=600)
print(out[-2000:])
assert proc.returncode == 0, f"train CLI exited {proc.returncode}"
interrupted = save_path + ".interrupted"
assert os.path.isfile(interrupted), "interrupted checkpoint missing"
assert "Training interrupted; state saved to" in out

from allophant_tpu.training import checkpoint as checkpoint_module

ckpt = checkpoint_module.load_checkpoint(interrupted)
assert ckpt.optimizer_state is not None, "no optimizer state in interrupted checkpoint"
interrupted_epoch = int(ckpt.epoch.epoch or 0)
interrupted_step = int(ckpt.epoch.global_step or 0)
print(f"interrupted at epoch={interrupted_epoch} global_step={interrupted_step}")
assert interrupted_step > 0

# Resume: --restore must prefer the interrupted file and finish a short run.
config["nn"]["maximum_iterations"] = interrupted_epoch + 1
resume = subprocess.run(
    [
        sys.executable, "-m", "allophant_tpu.cli.run", "train", corpus_root,
        "--cpu", "--no-progress", "-j", json.dumps(config), "-a", attribute_path,
        "-s", save_path, "--restore",
    ],
    env=env, capture_output=True, text=True, timeout=900,
)
print(resume.stdout[-1000:])
print(resume.stderr[-1000:])
assert resume.returncode == 0, f"resume exited {resume.returncode}"
final = checkpoint_module.load_checkpoint(save_path)
assert int(final.epoch.global_step or 0) > interrupted_step, "resume did not continue past the interrupt"
print("SIGTERM drive OK: interrupted at step", interrupted_step, "resumed to", int(final.epoch.global_step))
