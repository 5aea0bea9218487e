#!/usr/bin/env python3
"""Drives the predict CLI end to end on the current backend (real TPU included)
with a synthetic UCLA corpus and a freshly initialized tiny checkpoint — the
hardware smoke test for the full predict pipeline (model forward + device
decode + JSONL output). Run from the repo root."""
import sys, os, json, tempfile, wave
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.expanduser("~"), ".cache", "allophant_tpu_xla"))
import numpy as np
from fixtures import mini_allophoible_csv, mini_config_dict
from allophant_tpu.config import Config
from allophant_tpu.models.allophant import attribute_graph_from_config
from allophant_tpu.training import Estimator
from allophant_tpu.cli import run as run_cli
from allophant_tpu.phonetics.features import FeatureSet, PhoneticAttributeIndexer

def write_wav(path, data):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1); f.setsampwidth(2); f.setframerate(16000)
        f.writeframes((data * 32767).astype(np.int16).tobytes())

tmp = tempfile.mkdtemp()
ucla = os.path.join(tmp, "corpus")
rng = np.random.default_rng(0)
for language, phonemes in [("spa", ["a", "t", "n"]), ("ita", ["a", "s"])]:
    base = os.path.join(ucla, language)
    os.makedirs(os.path.join(base, "audio"))
    with open(os.path.join(base, "inventory"), "w") as f:
        for p in phonemes: f.write(f"{p} 5\n")
    with open(os.path.join(base, "raw"), "w") as raw, open(os.path.join(base, "text"), "w") as text:
        for i in range(2):
            utt = f"{language}_{i}"
            raw.write(f"{utt} rawform\n")
            text.write(f"{utt} {' '.join(phonemes)}\n")
            write_wav(os.path.join(base, "audio", f"{utt}.wav"), rng.uniform(-0.3, 0.3, 1600 + 320*i).astype(np.float32))

config = Config.load(mini_config_dict())
indexer = PhoneticAttributeIndexer(
    FeatureSet.PHOIBLE, mini_allophoible_csv(),
    attribute_subset=[e.name for e in config.nn.projection.classes],
    language_inventories=["spa", "ita"],
)
estimator = Estimator.from_config(config, 1, 16_000, attribute_graph_from_config(config, indexer), indexer, load_pretrained_weights=False)
ckpt = os.path.join(tmp, "model.ckpt")
estimator.save(ckpt, phonetic_indexer_state=indexer.state())
pred = os.path.join(tmp, "pred.jsonl")
run_cli.main(["predict", ucla, ckpt, "--no-progress", "-t", "ucla-phonetic", "-m", "utterances", "-s", "2", "-o", pred])
lines = open(pred).read().strip().splitlines()
print("predict lines:", len(lines))
p = json.loads(lines[1])
print("heads:", sorted(p["predictions"])[:5], "ok")
