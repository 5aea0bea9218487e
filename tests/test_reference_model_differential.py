"""Differential tests: the reference's own torch *model layer* vs our flax stack.

Round 2's restore-parity tests compare against hand-reimplemented torch heads;
these tests remove the hand translation from the loop entirely. The reference's
``allophant.network.acoustic_model`` (torch + HF transformers, both present in
this image) is imported through ``reference_shim.load_reference_network`` and its
actual ``Allophant`` module — wav2vec2 wrapper, ``HierarchicalProjection``,
``EmbeddingCompositionLayer``, ``AllophoneMapping``, ``ProjectingMultiheadAttention``
(reference acoustic_model.py:90-1064) — generates BOTH the checkpoint weights
(its real ``state_dict()``, exactly what released checkpoints contain) and the
expected outputs. Our ``Estimator.restore`` consumes that state through the
production converter and must reproduce the forward within f32 tolerance, across
every head type: shared linear, hierarchical dependencies, attention time layers,
embedding composition (incl. zero-shot inventories), and the allophone layer.

This is the complete released-checkpoint inference path executed against the
reference's own code — the only absent ingredients are the published weights
themselves (artifacts not mounted in this environment).
"""

from __future__ import annotations

import json
import warnings
from typing import Dict, Optional

import numpy as np
import pandas as pd
import pytest

from reference_shim import load_reference_network, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not mounted at /root/reference"
)

from fixtures import CLASSIFIER_FEATURES, mini_allophoible_csv, mini_config_dict

TINY = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=48,
    conv_dim=(12, 16),
    conv_kernel=(4, 3),
    conv_stride=(2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


@pytest.fixture(autouse=True)
def _pandas2_string_semantics():
    with pd.option_context("future.infer_string", False):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            yield


@pytest.fixture(scope="module")
def ref_network():
    return load_reference_network()


def _local_wav2vec2_dir(tmp_path) -> str:
    """A local HF model directory (config + preprocessor config, no weights) so the
    reference's ``Wav2Vec2AcousticModel`` constructs fully offline."""
    from transformers import Wav2Vec2Config as HFConfig

    model_dir = tmp_path / "tiny-w2v2"
    model_dir.mkdir()
    HFConfig(
        **TINY,
        conv_bias=True,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
        attn_implementation="eager",
    ).save_pretrained(model_dir)
    (model_dir / "preprocessor_config.json").write_text(
        json.dumps(
            {
                "feature_extractor_type": "Wav2Vec2FeatureExtractor",
                "feature_size": 1,
                "padding_side": "right",
                "padding_value": 0.0,
                "do_normalize": True,
                "return_attention_mask": True,
                "sampling_rate": 16000,
            }
        ),
        encoding="utf-8",
    )
    return str(model_dir)


def _build_reference_model(
    ref_network,
    model_dir: str,
    phoneme_layer: str,
    composition: bool,
    attention_heads: Optional[Dict[str, int]] = None,
    phoneme_dependencies=None,
):
    """Constructs the reference's actual Allophant module (random weights,
    deterministic seed) plus the reference-side indexer and graph."""
    import sys

    import torch

    acoustic_model_module, _frontend, graph_module = ref_network
    ref_features = sys.modules["allophant.phonetic_features"]
    config_stub = sys.modules["allophant.config"]

    inventories = ref_features.LanguageInventories(
        {0: ["a", "b", "d", "t"], 1: ["a", "t", "s"]}, ["es", "it"]
    )
    indexer = ref_features.PhoneticAttributeIndexer(
        config_stub.FeatureSet.PHOIBLE,
        _csv_buffer(),
        CLASSIFIER_FEATURES + ["phoneme"],
        sorted(inventories.shared_inventory()),
        inventories,
        allophones_from_allophoible=False,
    )

    attention_heads = attention_heads or {}
    nodes = []
    for name in CLASSIFIER_FEATURES:
        time_layer = (
            config_stub.MultiheadAttentionConfig(num_heads=attention_heads[name])
            if name in attention_heads
            else None
        )
        nodes.append(
            graph_module.AttributeNode(name, indexer.size(name), time_layer, ["OUTPUT"])
        )
    nodes.append(
        graph_module.AttributeNode(
            "phoneme",
            len(indexer.phonemes),
            None,
            list(phoneme_dependencies) if phoneme_dependencies is not None else ["OUTPUT"],
        )
    )
    graph = graph_module.AttributeGraph(nodes)

    projection_config = config_stub.ProjectionConfig(
        phoneme_layer=getattr(config_stub.PhonemeLayerType, phoneme_layer.upper()),
        embedding_composition=config_stub.EmbeddingCompositionConfig(32) if composition else None,
        acoustic_model_dropout=0.0,
    )

    torch.manual_seed(0)
    acoustic = acoustic_model_module.Wav2Vec2AcousticModel(
        model_dir, 16_000, load_pretrained_weights=False
    )
    model = acoustic_model_module.Allophant(
        acoustic,
        graph,
        1,  # blank offset (reference config.py:553-555)
        projection_config,
        indexer,
    ).eval()
    return model, indexer, graph


def _csv_buffer():
    from io import StringIO

    return StringIO(mini_allophoible_csv())


def _our_checkpoint_from_reference(tmp_path, reference_model, phoneme_layer, composition,
                                   attention_heads=None, phoneme_dependencies=None) -> str:
    """Wraps the reference module's real state_dict in the reference's on-disk
    checkpoint structure, built with OUR config/indexer/graph (the metadata half
    is ours by design — released checkpoints embed the same information)."""
    import torch

    from allophant_tpu.config import Config
    from allophant_tpu.models.allophant import attribute_graph_from_config
    from allophant_tpu.phonetics.features import LanguageInventories, PhoneticAttributeIndexer

    config_dict = mini_config_dict(
        phoneme_layer=phoneme_layer, embedding_composition=composition, model_type="wav2vec2"
    )
    for entry in config_dict["nn"]["projection"]["classes"]:
        if attention_heads and entry["name"] in attention_heads:
            entry["time_layer"] = {
                "type": "multi-head-attention",
                "num_heads": attention_heads[entry["name"]],
            }
        if entry["name"] == "phoneme" and phoneme_dependencies is not None:
            entry["dependencies"] = list(phoneme_dependencies)
    config = Config.load(config_dict)
    inventories = LanguageInventories({0: ["a", "b", "d", "t"], 1: ["a", "t", "s"]}, ["es", "it"])
    if phoneme_layer == "allophones":
        # Mirror the reference-side construction exactly (identity mappings via
        # LanguageInventories.map_allophones): the reference's Allophoible-derived
        # mapping path cannot run under pandas 3 (see test_reference_differential),
        # and the checkpoint's embedded mappings must match the torch matrices'
        # shared-phone axis. The Allophoible-derived mapping *construction* is
        # pinned separately by the phonetics differential suite.
        indexer = PhoneticAttributeIndexer(
            "phoible",
            mini_allophoible_csv(),
            CLASSIFIER_FEATURES + ["phoneme"],
            sorted(inventories.shared_inventory()),
            inventories,
            allophones_from_allophoible=False,
        )
    else:
        indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv(), inventories)
    graph = attribute_graph_from_config(config, indexer)

    checkpoint_data = {
        "config": config.dump(),
        "allophant_version": "reference-differential",
        "feature_size": 1,
        "sample_rate": 16000,
        "attribute_graph": graph.to_dict(),
        "epoch": {"epoch": 1, "global_step": 1, "step": 1},
        "phonetic_indexer_state": indexer.state().to_dict(),
        "dataset_meta_data": [],
        "model_state": reference_model.state_dict(),
        "optimization_states": None,
        "history": [],
        "additional": None,
    }
    path = str(tmp_path / "reference_differential.pt")
    torch.save(checkpoint_data, path)
    return path


def _compare_predictions(reference_model, path, seed=3, target_inventory=None, atol=2e-3):
    import sys

    import torch

    from allophant_tpu.data.batch import Batch
    from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture
    from allophant_tpu.training import Estimator

    tiny_arch = Wav2Vec2Architecture(
        **TINY, hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0
    )
    estimator, indexer = Estimator.restore(path, wav2vec2_architecture=tiny_arch, precision="float32")

    rng = np.random.default_rng(seed)
    samples = 800
    audio = rng.standard_normal((2, samples)).astype(np.float32)
    lengths = np.array([samples, samples - 200])
    for row, length in enumerate(lengths):
        audio[row, length:] = 0.0
    language_ids = np.array([0, 1])

    target_matrix = None
    if target_inventory is not None:
        target_matrix = indexer.composition_feature_matrix(list(target_inventory))

    ours = estimator.predict(
        Batch(audio, lengths, language_ids),
        target_feature_indices=target_matrix,
        log_probabilities=False,
    )
    frame_lengths = np.asarray(ours.lengths)

    BatchStub = sys.modules["allophant.dataset_processing"].Batch
    torch_batch = BatchStub(
        torch.from_numpy(audio), torch.from_numpy(lengths), torch.from_numpy(language_ids)
    )
    torch_target = None if target_matrix is None else torch.from_numpy(np.asarray(target_matrix))
    with torch.no_grad():
        expected = reference_model(torch_batch, torch_target, predict=True)

    np.testing.assert_array_equal(np.asarray(expected.lengths), frame_lengths)
    assert set(expected.outputs) == set(ours.outputs)
    frames = int(frame_lengths.max())
    frame_mask = np.arange(frames)[None, :] < frame_lengths[:, None]
    for name, expected_head in expected.outputs.items():
        theirs = expected_head.numpy()[:frames]  # reference is time-first [T, B, C]
        mine = np.asarray(ours.outputs[name])[:frames]
        difference = np.abs(mine - theirs)[frame_mask.T]
        assert difference.max() < atol, f"{name}: max |diff| {difference.max():.2e}"
    return estimator, indexer


@pytest.mark.parametrize("variant", ["linear-sequential-affine", "direct-plain"])
def test_from_scratch_transformer_matches_reference(ref_network, tmp_path, variant):
    """The from-scratch model family (reference acoustic_model.py:553-759,
    frontend.py): the reference's own ``TransformerAcousticModel.from_config``
    builds the torch model, its real state_dict restores through our converter's
    transformer branch, and forwards must agree — Linear/Direct frontends, GLU
    sequential frontend with variable-length reflect padding, affine and
    non-affine layer norms, sinusoidal position embeddings."""
    import sys
    from types import SimpleNamespace

    import torch

    acoustic_model_module, _frontend, graph_module = ref_network
    ref_features = sys.modules["allophant.phonetic_features"]
    config_stub = sys.modules["allophant.config"]

    affine = variant == "linear-sequential-affine"
    transformer_stub = SimpleNamespace(
        heads=2, feedforward_neurons=64, num_layers=2, dropout_rate=0.0,
        activation="relu", positional_embeddings=True,
    )
    if affine:
        frontend_stub = config_stub.LinearFrontendConfig(neurons=32, input_dropout=0.0)
        sequential_stub = config_stub.SequentialFrontendConfig(
            [
                config_stub.Glu1dConfig(out_channels=24, kernel=3, stride=2),
                config_stub.LayerNormConfig(affine=True),
                config_stub.DropoutConfig(rate=0.0),
            ]
        )
        acoustic_dict = {
            "type": "pre-ln-transformer",
            "transformer": {
                "feedforward_neurons": 64, "heads": 2, "num_layers": 2,
                "dropout_rate": 0.0, "activation": "relu", "positional_embeddings": True,
            },
            "frontend": {"architecture": "linear", "neurons": 32, "input_dropout": 0.0},
            "sequential_frontend": {
                "layers": [
                    {"type": "glu1d", "out_channels": 24, "kernel": 3, "stride": 2},
                    {"type": "layer_norm", "affine": True},
                    {"type": "dropout", "rate": 0.0},
                ]
            },
            "elementwise_affine": True,
        }
    else:
        frontend_stub = config_stub.DirectFrontendConfig(input_dropout=0.0)
        sequential_stub = None
        acoustic_dict = {
            "type": "pre-ln-transformer",
            "transformer": {
                "feedforward_neurons": 64, "heads": 2, "num_layers": 2,
                "dropout_rate": 0.0, "activation": "relu", "positional_embeddings": True,
            },
            "frontend": {"architecture": "direct", "input_dropout": 0.0},
            "elementwise_affine": False,
        }
    layer_config_stub = config_stub.TransformerAcousticModelConfig(
        transformer=transformer_stub,
        frontend=frontend_stub,
        sequential_frontend=sequential_stub,
        elementwise_affine=affine,
    )

    feature_size = 8 if affine else 32
    torch.manual_seed(1)
    acoustic = acoustic_model_module.TransformerAcousticModel.from_config(
        layer_config_stub, feature_size
    ).eval()

    # Shared-linear heads on top, like the reference baseline models.
    inventories = ref_features.LanguageInventories(
        {0: ["a", "b", "d", "t"], 1: ["a", "t", "s"]}, ["es", "it"]
    )
    indexer = ref_features.PhoneticAttributeIndexer(
        config_stub.FeatureSet.PHOIBLE,
        _csv_buffer(),
        CLASSIFIER_FEATURES + ["phoneme"],
        sorted(inventories.shared_inventory()),
        inventories,
        allophones_from_allophoible=False,
    )
    nodes = [
        graph_module.AttributeNode(name, indexer.size(name), None, ["OUTPUT"])
        for name in CLASSIFIER_FEATURES
    ] + [graph_module.AttributeNode("phoneme", len(indexer.phonemes), None, ["OUTPUT"])]
    reference_model = acoustic_model_module.Allophant(
        acoustic,
        graph_module.AttributeGraph(nodes),
        1,
        config_stub.ProjectionConfig(phoneme_layer=config_stub.PhonemeLayerType.SHARED),
        indexer,
    ).eval()

    # Our checkpoint with the reference's real state_dict.
    from allophant_tpu.config import Config
    from allophant_tpu.models.allophant import attribute_graph_from_config
    from allophant_tpu.phonetics.features import LanguageInventories, PhoneticAttributeIndexer

    config_dict = mini_config_dict()
    config_dict["nn"]["acoustic_model"] = acoustic_dict
    config = Config.load(config_dict)
    my_inventories = LanguageInventories({0: ["a", "b", "d", "t"], 1: ["a", "t", "s"]}, ["es", "it"])
    my_indexer = PhoneticAttributeIndexer.from_config(config, mini_allophoible_csv(), my_inventories)
    graph = attribute_graph_from_config(config, my_indexer)
    checkpoint_data = {
        "config": config.dump(),
        "allophant_version": "reference-differential",
        "feature_size": feature_size,
        "sample_rate": 16000,
        "attribute_graph": graph.to_dict(),
        "epoch": {"epoch": 1, "global_step": 1, "step": 1},
        "phonetic_indexer_state": my_indexer.state().to_dict(),
        "dataset_meta_data": [],
        "model_state": reference_model.state_dict(),
        "optimization_states": None,
        "history": [],
        "additional": None,
    }
    path = str(tmp_path / "from_scratch.pt")
    torch.save(checkpoint_data, path)

    from allophant_tpu.data.batch import Batch
    from allophant_tpu.training import Estimator

    estimator, _restored_indexer = Estimator.restore(path, precision="float32")

    rng = np.random.default_rng(9)
    frames = 40
    # Batch 1 for the sequential-frontend variant: the reference's reflect-pad
    # bug broadcasts row 0's left padding into every row (see
    # test_variable_length_reflect_pad_reference_bug), and attention spreads
    # that contamination to all frames — only row 0 is well-defined on the
    # reference side. The plain variant compares a 2-row batch with a short row.
    batch_size = 1 if affine else 2
    features = rng.standard_normal((batch_size, frames, feature_size)).astype(np.float32)
    lengths = np.array([frames, frames - 11], dtype=np.int32)[:batch_size]
    for row, length in enumerate(lengths):
        features[row, length:] = 0.0
    language_ids = np.arange(batch_size, dtype=np.int32)

    ours = estimator.predict(
        Batch(features, lengths, language_ids), log_probabilities=False
    )
    frame_lengths = np.asarray(ours.lengths)

    BatchStub = sys.modules["allophant.dataset_processing"].Batch
    with torch.no_grad():
        # Reference frontends consume [B, F, T].
        expected = reference_model(
            BatchStub(
                torch.from_numpy(features.transpose(0, 2, 1)),
                torch.from_numpy(lengths),
                torch.from_numpy(language_ids),
            ),
            predict=True,
        )

    valid_frames = int(frame_lengths.max())
    frame_mask = np.arange(valid_frames)[None, :] < frame_lengths[:, None]
    for name, expected_head in expected.outputs.items():
        theirs = expected_head.numpy()[:valid_frames]
        mine = np.asarray(ours.outputs[name])[:valid_frames]
        difference = np.abs(mine - theirs)[frame_mask.T]
        assert difference.max() < 2e-3, f"{variant}/{name}: max |diff| {difference.max():.2e}"


def test_variable_length_reflect_pad_reference_bug(ref_network):
    """Latent reference bug, discovered by executing its own code: in
    ``VariableLengthReflectPad`` (reference padding.py:41-53) the left-pad
    ``gather`` builds a batch-size-1 index, and the ``padded[..., :left] = ...``
    assignment then *broadcasts row 0's reflected values into every batch row* —
    the left padding of every sequence in a batch contains the FIRST sequence's
    samples (cross-batch contamination; batch-composition-dependent outputs).
    Right padding is computed per row and is correct. We reflect per row
    (models/transformer.py:variable_length_reflect_pad); this test pins both
    behaviors so the deviation stays deliberate."""
    import sys

    import torch

    from allophant_tpu.models.transformer import variable_length_reflect_pad

    padding_module = sys.modules["allophant.network.padding"]
    pad = padding_module.VariableLengthReflectPad((1, 2))
    features = torch.arange(1, 13, dtype=torch.float32).view(2, 1, 6)  # [B, F, T]
    lengths = torch.tensor([6, 4])
    reference = pad(features, lengths)
    # Row 0: true reflection at the sequence start.
    assert reference[0, 0, 0].item() == features[0, 0, 1].item()
    # Row 1: receives ROW 0's reflected value, not its own.
    assert reference[1, 0, 0].item() == features[0, 0, 1].item()
    assert reference[1, 0, 0].item() != features[1, 0, 1].item()

    ours = np.asarray(
        variable_length_reflect_pad(
            np.asarray(features.numpy().transpose(0, 2, 1)), np.array([6, 4]), (1, 2)
        )
    )
    # Ours reflects per row on both edges...
    assert ours[0, 0, 0] == features[0, 0, 1].item()
    assert ours[1, 0, 0] == features[1, 0, 1].item()
    # ...and matches the reference's (correct, per-row) right padding at length.
    np.testing.assert_array_equal(ours[0, 1:], reference[0, 0, 1:].numpy()[:, None])
    np.testing.assert_array_equal(ours[1, 1:5 + 2], reference[1, 0, 1:7].numpy()[:, None])


def test_conv_length_math_matches_reference(ref_network):
    """Frame-count math after convolutions drives every CTC length — pinned
    against the reference's own ``frontend.conv_length``/``padding.get_padding``
    (reference frontend.py:192-203, padding.py:10-21) over randomized
    kernel/stride combinations, padded and unpadded."""
    import torch

    from allophant_tpu.ops import masking

    _acoustic, ref_frontend, _graph = ref_network
    rng = np.random.default_rng(41)
    for _ in range(40):
        kernel = int(rng.integers(1, 12))
        stride = int(rng.integers(1, 6))
        for use_padding in (False, True):
            for stft_type in ((False, True) if use_padding else (False,)):
                reference_fn = ref_frontend.conv_length(kernel, stride, use_padding, stft_type)
                lengths = rng.integers(kernel, 4000, size=16)
                expected = reference_fn(torch.from_numpy(lengths)).numpy()
                padding_total = (
                    sum(masking.get_padding(kernel, stride, stft_type)) if use_padding else 0
                )
                ours = masking.conv_output_length(lengths, kernel, stride, padding_total)
                np.testing.assert_array_equal(np.asarray(ours), expected, err_msg=f"{kernel}/{stride}")

    # The wav2vec2 downsampling chain (no padding), the exact CTC length path.
    from allophant_tpu.models.wav2vec2 import Wav2Vec2Architecture

    arch = Wav2Vec2Architecture(**TINY)
    chain = [
        ref_frontend.conv_length(kernel, stride, use_padding=False)
        for kernel, stride in zip(arch.conv_kernel, arch.conv_stride)
    ]
    lengths = rng.integers(64, 32_000, size=32)
    expected = torch.from_numpy(lengths)
    for fn in chain:
        expected = fn(expected)
    np.testing.assert_array_equal(
        np.asarray(arch.downsampled_lengths(lengths)), expected.numpy()
    )


def test_unfreeze_schedule_matches_reference(ref_network, tmp_path):
    """Step semantics of the unfreeze schedule (reference acoustic_model.py:856-905):
    the reference flips requires_grad after the N-th post-update step() call, so a
    group is frozen for 0-based update indices < N and trainable from index N on —
    exactly our FreezePlan's ``step >= threshold`` factor (train_step.py)."""
    import torch

    import jax.numpy as jnp

    from allophant_tpu.training.train_step import FreezePlan, apply_freeze_plan

    acoustic_model_module, _frontend, _graph_module = ref_network
    model_dir = _local_wav2vec2_dir(tmp_path)
    torch.manual_seed(0)
    acoustic = acoustic_model_module.Wav2Vec2AcousticModel(
        model_dir, 16_000, freeze_feature_encoder=True, load_pretrained_weights=False
    )
    # feature_extractor: frozen by flag + thawed by the schedule at step 2.
    # feature_projection: scheduled but NOT flag-frozen — the reference schedule
    # only thaws (acoustic_model.py:879-897), so the group trains from update 0
    # and build_freeze_plan must exclude it from the plan.
    from types import SimpleNamespace

    from allophant_tpu.training.train_step import build_freeze_plan as _noop  # noqa: F401

    schedule = acoustic_model_module.UnfreezeSchedule(
        feature_extractor=2, feature_projection=4
    )
    plan = FreezePlan(((("acoustic_model", "feature_extractor"), 2),))
    grads = {
        "acoustic_model": {
            "feature_extractor": jnp.ones(3),
            "feature_projection": jnp.ones(3),
            "encoder": jnp.ones(3),
        }
    }

    groups = {
        "feature_extractor": acoustic._model.feature_extractor,
        "feature_projection": acoustic._model.feature_projection,
    }
    for update_index in range(6):
        # State DURING update `update_index` (before its post-update step() call).
        reference_trainable = {
            name: any(parameter.requires_grad for parameter in module.parameters())
            for name, module in groups.items()
        }
        masked = apply_freeze_plan(grads, plan, jnp.asarray(update_index, jnp.int32))
        ours_trainable = {
            name: bool(np.asarray(masked["acoustic_model"][name]).any()) for name in groups
        }
        assert ours_trainable == reference_trainable, f"update {update_index}"
        assert bool(np.asarray(masked["acoustic_model"]["encoder"]).any())  # never frozen
        schedule.step(acoustic)


def test_shared_linear_heads_match_reference(ref_network, tmp_path):
    model_dir = _local_wav2vec2_dir(tmp_path)
    reference_model, _ref_indexer, _graph = _build_reference_model(
        ref_network, model_dir, "shared", composition=False
    )
    path = _our_checkpoint_from_reference(tmp_path, reference_model, "shared", False)
    _compare_predictions(reference_model, path)


def test_hierarchical_attention_heads_match_reference(ref_network, tmp_path):
    # embed_dim of the attention time layer is the head's output size incl. the
    # blank (nasal: 2 categories + blank = 3), and num_heads must divide it.
    attention_heads = {"nasal": 3}
    dependencies = ["OUTPUT", "nasal", "syllabic"]
    model_dir = _local_wav2vec2_dir(tmp_path)
    reference_model, _ref_indexer, _graph = _build_reference_model(
        ref_network,
        model_dir,
        "shared",
        composition=False,
        attention_heads=attention_heads,
        phoneme_dependencies=dependencies,
    )
    path = _our_checkpoint_from_reference(
        tmp_path, reference_model, "shared", False,
        attention_heads=attention_heads, phoneme_dependencies=dependencies,
    )
    _compare_predictions(reference_model, path)


def test_composition_and_zero_shot_match_reference(ref_network, tmp_path):
    model_dir = _local_wav2vec2_dir(tmp_path)
    reference_model, ref_indexer, _graph = _build_reference_model(
        ref_network, model_dir, "shared", composition=True
    )
    path = _our_checkpoint_from_reference(tmp_path, reference_model, "shared", True)
    # Training-inventory decode AND a caller-supplied zero-shot inventory
    # (the README's zero-shot mechanism, reference acoustic_model.py:219-234).
    _compare_predictions(reference_model, path)
    zero_shot = ["a", "s", "i", "o", "m"]
    _compare_predictions(reference_model, path, seed=5, target_inventory=zero_shot)


def test_allophone_layer_matches_reference(ref_network, tmp_path):
    import torch

    model_dir = _local_wav2vec2_dir(tmp_path)
    reference_model, _ref_indexer, _graph = _build_reference_model(
        ref_network, model_dir, "allophones", composition=False
    )
    path = _our_checkpoint_from_reference(tmp_path, reference_model, "allophones", False)
    estimator, indexer = _compare_predictions(reference_model, path)

    # Training-mode allophone mapping (multiply -> mask -> max, reference
    # acoustic_model.py:75-159) and the L2 pull toward initialization (:169-177).
    rng = np.random.default_rng(11)
    num_shared = len(indexer.language_allophones.shared_phones) + 1
    phone_logits = rng.standard_normal((3, 2, num_shared)).astype(np.float32)
    language_ids = np.array([0, 1])
    mine = np.asarray(estimator.map_allophones(phone_logits, language_ids))
    # Latent reference bug, discovered by executing its own code: the public
    # HierarchicalProjection.map_allophones (acoustic_model.py:541-546) looks up
    # self._layers["phoneme"], which is always the HierarchicalClassifier wrapper
    # — never an AllophoneMapping — so the isinstance gate fails and the
    # reference's `--language-phonemes` path (run.py:755-760) raises on every
    # allophone model. We implement the documented intent; the mapping *math* is
    # pinned against the wrapped layer directly.
    with pytest.raises(ValueError, match="allophone layer"):
        reference_model.map_allophones(
            torch.from_numpy(phone_logits), torch.from_numpy(language_ids)
        )
    inner = reference_model.projection.classifier_layers["phoneme"]._allophone_layer
    with torch.no_grad():
        theirs = inner.map_allophones(
            torch.from_numpy(phone_logits), torch.from_numpy(language_ids)
        ).numpy()
    # Reference masks non-allophones with -FLT_MAX, we use -1e9: both are exact
    # zeros after softmax; compare only unmasked positions and check masking.
    masked = theirs <= -1e30
    np.testing.assert_allclose(mine[~masked], theirs[~masked], atol=1e-4)
    assert (mine[masked] <= -1e8).all()

    # Same wrapper bug in the public l2_penalty (acoustic_model.py:533-536): the
    # isinstance gate never sees the wrapped AllophoneMapping, so the reference
    # returns None — i.e. its allophone L2 regularizer (estimator.py:754-758,
    # allophone_l2_alpha) was silently inert in this code version. The penalty
    # *math* is pinned against the wrapped layer.
    assert reference_model.l2_penalty() is None
    with torch.no_grad():
        expected_penalty = inner.l2_penalty()
    mine_penalty = float(
        estimator.model.apply(estimator.variables, method="l2_penalty")
    )
    assert mine_penalty == pytest.approx(float(expected_penalty), abs=1e-6)
