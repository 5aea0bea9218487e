"""Tests for the phonetic-knowledge layer: feature indexer, graph, codes, segmentation."""

import numpy as np
import pytest

from allophant_tpu.config import Config
from allophant_tpu.phonetics import segmentation
from allophant_tpu.phonetics.attribute_graph import (
    AttributeGraph,
    AttributeNode,
    DependencyCycleError,
)
from allophant_tpu.phonetics.features import (
    FeatureSet,
    LanguageInventories,
    PhoneticAttributeIndexer,
    PhoneticIndexerState,
)
from allophant_tpu.phonetics.language_codes import (
    LanguageCode,
    LanguageCodeMap,
    standardize_to_iso6393,
)

from fixtures import CLASSIFIER_FEATURES, mini_allophoible_csv, mini_config_dict


@pytest.fixture(scope="module")
def table_csv() -> str:
    return mini_allophoible_csv()


@pytest.fixture(scope="module")
def indexer(table_csv) -> PhoneticAttributeIndexer:
    return PhoneticAttributeIndexer(FeatureSet.PHOIBLE, table_csv)


class TestLanguageCodes:
    def test_two_letter(self):
        assert standardize_to_iso6393("es") == "spa"
        assert standardize_to_iso6393("it") == "ita"
        assert standardize_to_iso6393("de") == "deu"
        assert standardize_to_iso6393("sv-SE") == "swe"
        assert standardize_to_iso6393("ga-IE") == "gle"

    def test_three_letter_passthrough(self):
        assert standardize_to_iso6393("spa") == "spa"
        assert standardize_to_iso6393("fre") == "fra"  # bibliographic form

    def test_macro(self):
        assert LanguageCode.from_str("cmn", True, True).alpha3 == "zho"
        assert LanguageCode.from_str("azj", True, True).alpha3 == "aze"
        assert LanguageCode.from_str("spa", True, True).alpha3 == "spa"

    def test_variant_parsing(self):
        code = LanguageCode.from_str("sv-SE")
        assert code.language == "sv"
        assert code.variant == "SE"
        assert str(code) == "sv-SE"

    def test_code_map(self):
        mapping = LanguageCodeMap(["es", "sv-SE", "ga-IE"])
        assert mapping["es"] == "es"
        assert mapping["sv"] == "sv-SE"
        assert mapping["ga"] == "ga-IE"
        assert "es" in mapping
        assert "sv" in mapping

    def test_code_map_duplicates(self):
        mapping = LanguageCodeMap(["pt-PT", "pt-BR"], defaults={"pt": "pt-PT"})
        assert mapping["pt-PT"] == "pt-PT"
        assert mapping["pt-BR"] == "pt-BR"
        assert mapping["pt"] == "pt-PT"


class TestAttributeGraph:
    def test_sort_simple(self):
        graph = AttributeGraph(
            [
                AttributeNode("phoneme", 10, dependencies=["nasal", "OUTPUT"]),
                AttributeNode("nasal", 2, dependencies=["OUTPUT"]),
            ]
        )
        order = [node.name for node in graph.sort()]
        assert order.index("nasal") < order.index("phoneme")

    def test_cycle_detection(self):
        graph = AttributeGraph(
            [
                AttributeNode("a", 1, dependencies=["b"]),
                AttributeNode("b", 1, dependencies=["a"]),
            ]
        )
        with pytest.raises(DependencyCycleError):
            list(graph.sort())

    def test_self_dependency_detection(self):
        # A self-loop is a one-node SCC that plain Tarjan cannot flag, but the
        # classifier would read its own logits before they exist.
        graph = AttributeGraph([AttributeNode("a", 1, dependencies=["a"])])
        with pytest.raises(DependencyCycleError, match="depends on itself"):
            list(graph.sort())

    def test_diamond(self):
        graph = AttributeGraph(
            [
                AttributeNode("top", 1, dependencies=["left", "right"]),
                AttributeNode("left", 1, dependencies=["base"]),
                AttributeNode("right", 1, dependencies=["base"]),
                AttributeNode("base", 1, dependencies=["OUTPUT"]),
            ]
        )
        order = [node.name for node in graph.sort()]
        assert order.index("base") < order.index("left")
        assert order.index("base") < order.index("right")
        assert order.index("left") < order.index("top")
        assert order.index("right") < order.index("top")

    def test_serialization_roundtrip(self):
        graph = AttributeGraph(
            [
                AttributeNode("x", 3, dependencies=["OUTPUT"]),
                AttributeNode("y", 4, dependencies=["x"]),
            ]
        )
        restored = AttributeGraph.from_dict(graph.to_dict())
        assert [node.name for node in restored] == ["x", "y"]
        assert restored["y"].size == 4
        assert [node.name for node in restored.sort()] == ["x", "y"]

    def test_with_offset(self):
        node = AttributeNode("n", 5, dependencies=["OUTPUT"])
        assert node.with_offset(1).size == 6
        assert node.size == 5


class TestSegmentationUtils:
    def test_split_complex_segment(self):
        assert segmentation.split_complex_segment("ai̯") == ["a", "i̯"]
        assert segmentation.split_complex_segment("a") == ["a"]
        # Tie characters bind into one grapheme cluster with regex \X? They don't -
        # the tie joins two clusters; leading marks attach forward.
        parts = segmentation.split_complex_segment("t͡ʃ")
        assert "".join(parts) == "t͡ʃ"

    def test_base_phonemes(self):
        assert list(segmentation.base_phonemes("ai̯")) == ["a", "i"]
        assert list(segmentation.base_phonemes("tʰ")) == ["t"]

    def test_vowel_helpers(self):
        assert segmentation.is_vowel_only_segment("ai̯")
        assert not segmentation.is_vowel_only_segment("ta")
        assert segmentation.is_multi_vowel(segmentation.base_phonemes("ai̯"))
        assert not segmentation.is_multi_vowel(segmentation.base_phonemes("a"))
        assert segmentation.complex_with_vowel(segmentation.base_phonemes("ta"))

    def test_filter_tones(self):
        assert list(segmentation.filter_tones(["a", "꜒", "b꜓"])) == ["a"]

    def test_lossy_segment_logs_missing(self, caplog):
        segmenter = segmentation.IpaSentenceSegmenter(["a", "b"])
        result = list(segmenter.lossy_segment([["ab", "ax"]]))
        assert result == [["a", "b", "a"]]


class TestIndexer:
    def test_basic_lookup(self, indexer):
        index = indexer.phoneme_index("a")
        assert indexer.phoneme(index) == "a"
        assert len(indexer) > 15

    def test_feature_categories_sorted(self, indexer):
        # Binarization must use sorted unique categories: "+" < "-" < "+,-" elements.
        categories = indexer.feature_categories("nasal")
        assert categories == sorted(categories)
        assert "+" in categories and "-" in categories

    def test_contour_dense_first(self, indexer):
        # Diphthong "ai̯" has contour high="-,+": dense table takes the first element.
        attrs = indexer.full_attributes
        high_column = attrs.feature_names.index("high")
        row = attrs.dense_feature_table[attrs.phoneme_index("ai̯")]
        minus_id = attrs._feature_categories["high"].index("-")
        assert row[high_column] == minus_id

    def test_get_named_with_offset(self, indexer):
        named = indexer.full_attributes.get_named(["a", "ai̯"], attribute_index_offset=1)
        # Contour contributes two label entries for "high".
        assert len(named["high"]) == 3
        assert (named["high"] >= 1).all()

    def test_subset_reindexes_phonemes(self, indexer):
        subset = indexer.full_attributes.subset(["t", "a", "n"])
        assert subset.phonemes.tolist() == ["t", "a", "n"]
        # Phoneme feature ids are subset positions.
        named = subset.get_named(["n"])
        assert named["phoneme"][0] == 2
        assert subset.feature_categories("phoneme") == ["t", "a", "n"]

    def test_composition_feature_matrix(self, indexer):
        matrix = indexer.composition_feature_matrix(["a", "t", "n"])
        assert matrix.shape == (3, len(indexer.composition_features))
        assert "tone" not in indexer.composition_features
        assert "phoneme" not in indexer.composition_features

    def test_phoneme_inventory_union(self, indexer):
        spanish = indexer.phoneme_inventory("es")
        assert "t͡ʃ" in spanish and "ʃ" not in spanish
        union = indexer.phoneme_inventory(["es", "de"])
        assert "ʃ" in union and "t͡ʃ" in union

    def test_allophone_extra_rows(self, indexer):
        # β and ð appear only as allophones: they get InventoryID 0 feature rows.
        data = indexer.allophone_data
        assert data is not None
        extra = data.inventories[data.inventories["InventoryID"] == 0]
        assert {"β", "ð"} <= set(extra.index)
        # And the shared phone indexer covers them.
        assert "β" in data.shared_phone_indexer.phonemes

    def test_hamming_and_closest(self, indexer):
        attrs = indexer.full_attributes
        # d and t differ only in no features here (identical rows) -> distance 0.
        features = attrs.simplified_feature_vector("s")
        closest = attrs.closest_phone_for("s", features)
        assert attrs.phoneme(closest) == "s"

    def test_map_inventories_closest_exact_first(self, indexer):
        mapping = indexer.full_attributes.map_inventories_closest(["a", "z"], ["a", "s"])
        assert mapping["a"] == ["a"]
        assert mapping["z"] == ["s"]  # z maps to closest: s (identical features)

    def test_map_inventories_complex_split(self, indexer):
        mapping = indexer.full_attributes.map_inventories_closest(
            ["ai̯"], ["a", "i", "e"], split_non_matching_complex=True
        )
        # The diphthong should split into subsegments mapped individually.
        assert len(mapping["ai̯"]) == 2
        assert mapping["ai̯"][0] == "a"

    def test_missing_inventory_mappings_nfc(self, indexer):
        # NFD-decomposed input maps to the NFC form in the table.
        import unicodedata

        decomposed = unicodedata.normalize("NFD", "ai̯")
        if decomposed not in indexer.full_attributes.phonemes:
            mapping = indexer.full_attributes.missing_inventory_mappings([decomposed])
            assert mapping[decomposed] == "ai̯"

    def test_state_roundtrip(self, indexer, table_csv):
        state = indexer.state()
        assert state.table_file is not None
        restored = PhoneticAttributeIndexer.from_state(FeatureSet.PHOIBLE, state)
        assert restored.phonemes.tolist() == indexer.phonemes.tolist()

    def test_state_dict_roundtrip(self, indexer):
        state = indexer.state()
        restored = PhoneticIndexerState.from_dict(state.to_dict())
        assert restored.phoneme_inventory == state.phoneme_inventory


class TestIndexerFromConfig:
    def test_from_config_shared(self, table_csv):
        config = Config.load(mini_config_dict(phoneme_layer="shared"))
        inventories = LanguageInventories(
            {0: ["a", "t", "n", "s"], 1: ["a", "t", "m"]}, ["es", "it"]
        )
        indexer = PhoneticAttributeIndexer.from_config(config, table_csv, inventories)
        # Training subset = sorted shared inventory.
        assert indexer.phonemes.tolist() == sorted({"a", "t", "n", "s", "m"})
        # Classifier features in config order + phoneme.
        assert indexer.feature_names == CLASSIFIER_FEATURES + ["phoneme"]
        # Identity allophone mapping for the shared layer.
        allophones = indexer.language_allophones
        assert allophones is not None
        assert allophones.allophones[0][indexer.phoneme_index("a")] == [indexer.phoneme_index("a")]

    def test_from_config_allophones(self, table_csv):
        config = Config.load(mini_config_dict(phoneme_layer="allophones"))
        inventories = LanguageInventories({0: ["a", "b", "d"]}, ["es"])
        indexer = PhoneticAttributeIndexer.from_config(config, table_csv, inventories)
        allophones = indexer.language_allophones
        assert allophones is not None
        shared = allophones.shared_phones
        # Spanish d has allophones d and ð in the mini table.
        d_mapping = allophones.allophones[0][indexer.phoneme_index("d")]
        mapped_phones = {shared[index] for index in d_mapping}
        assert mapped_phones == {"d", "ð"}
        # Phone category exposed for decoding.
        assert indexer.feature_categories("phone") == shared

    def test_from_config_with_state(self, table_csv):
        config = Config.load(mini_config_dict(phoneme_layer="allophones"))
        inventories = LanguageInventories({0: ["a", "b", "d"]}, ["es"])
        indexer = PhoneticAttributeIndexer.from_config(config, table_csv, inventories)
        state = indexer.state()
        restored = PhoneticAttributeIndexer.from_config(config, state_dict=state)
        assert restored.phonemes.tolist() == indexer.phonemes.tolist()
        assert restored.language_allophones is not None
        assert restored.language_allophones.allophones == indexer.language_allophones.allophones

    def test_size_accessors(self, table_csv):
        config = Config.load(mini_config_dict())
        inventories = LanguageInventories({0: ["a", "t"]}, ["es"])
        indexer = PhoneticAttributeIndexer.from_config(config, table_csv, inventories)
        assert indexer.size("phoneme") == 2
        assert indexer.size() == sum(indexer.size(name) for name in indexer.feature_names)


class TestConfig:
    def test_default_config_loads(self):
        from allophant_tpu.package_data import DEFAULT_CONFIG_PATH

        config = Config.from_toml(DEFAULT_CONFIG_PATH)
        assert config.nn.batch_size == 16_000_000
        assert config.nn.accumulation_factor == 16
        assert len(config.nn.projection.classes) == 37
        assert config.nn.projection.embedding_composition.embedding_size == 640
        assert config.nn.acoustic_model.model_id == "facebook/wav2vec2-xls-r-300m"

    def test_roundtrip(self):
        config = Config.load(mini_config_dict(embedding_composition=True))
        dumped = config.dump()
        restored = Config.load(dumped)
        assert restored.dump() == dumped

    def test_warmup_schedule_phases(self):
        from allophant_tpu.config import WarmupConfig

        warmup = WarmupConfig(warmup_steps=100, constant_steps=50, factor=2)
        d_model = 256
        # Warmup phase is increasing.
        assert warmup.learning_rate(50, d_model) < warmup.learning_rate(99, d_model)
        # Plateau is constant at the peak value.
        assert warmup.learning_rate(100, d_model) == warmup.learning_rate(149, d_model)
        # Decay matches the reference formula.
        assert warmup.learning_rate(200, d_model) == pytest.approx(
            2 * d_model**-0.5 * (200 - 50) ** -0.5
        )

    def test_warmup_schedule_fn_matches(self):
        from allophant_tpu.config import WarmupConfig

        warmup = WarmupConfig(warmup_steps=10, constant_steps=5, factor=2)
        schedule = warmup.schedule(64)
        for count in [0, 5, 9, 12, 20, 100]:
            assert float(schedule(count)) == pytest.approx(
                warmup.learning_rate(count + 1, 64), rel=1e-5
            )


class TestPanphonFeatureSet:
    """Panphon-format feature tables load without the panphon package when an
    explicit table is provided (reference phonetic_features.py:628-642,974-986)."""

    PANPHON_CSV = "\n".join(
        [
            "ipa,syl,son,cons,cont,nas,lab,hi,lo,back",
            "a,+,+,-,+,-,-,-,+,-",
            "i,+,+,-,+,-,-,+,-,-",
            "u,+,+,-,+,-,+,+,-,+",
            "p,-,-,+,-,-,+,-,-,-",
            "t,-,-,+,-,-,-,-,-,-",
            "n,-,+,+,-,+,-,-,-,-",
            "t͡s,-,-,+,0,-,-,-,-,-",
        ]
    )

    def test_indexer_builds_from_csv(self):
        from allophant_tpu.phonetics.features import FeatureSet, PhoneticAttributeIndexer

        indexer = PhoneticAttributeIndexer(FeatureSet.PANPHON, self.PANPHON_CSV)
        phonemes = list(indexer.attributes.phonemes)
        assert "a" in phonemes and "t͡s" in phonemes
        # Tie-stripped variant added for G2P output without ties.
        assert "ts" in phonemes
        # syl is a regular composition feature for panphon (unlike PHOIBLE's tone).
        assert "syl" in indexer.composition_features

    def test_composition_matrix_round_trip(self):
        from allophant_tpu.phonetics.features import FeatureSet, PhoneticAttributeIndexer

        indexer = PhoneticAttributeIndexer(FeatureSet.PANPHON, self.PANPHON_CSV)
        matrix = indexer.composition_feature_matrix(["a", "p", "n"])
        assert matrix.shape[0] == 3

    def test_allophones_unsupported(self):
        from allophant_tpu.phonetics.features import FeatureSet, PhoneticAttributeIndexer

        with pytest.raises(NotImplementedError):
            PhoneticAttributeIndexer(
                FeatureSet.PANPHON, self.PANPHON_CSV, allophones_from_allophoible=True
            )

    def test_no_table_and_no_package_raises(self):
        from allophant_tpu.phonetics.features import read_panphon

        try:
            import panphon  # noqa: F401

            pytest.skip("panphon package installed")
        except ImportError:
            pass
        with pytest.raises(FileNotFoundError):
            read_panphon(None)


class TestMacroLanguageResolution:
    """_resolve_macro_language_variants: requested codes without their own
    PHOIBLE inventory resolve through their macro-language (reference
    phonetic_features.py:1095-1110; the reference's macro-preference update
    writes the wrong dict key — we implement the stated intent and pin it)."""

    def test_macro_inventory_replaces_sibling_variant(self):
        import pandas as pd

        from allophant_tpu.phonetics.features import _resolve_macro_language_variants

        # 'arz' (a sibling variant) appears before the macro code 'ara' itself:
        # the macro inventory must win for every requested Arabic variant.
        pool = pd.DataFrame({"ISO6393": ["arz", "spa", "ara"]})
        assert _resolve_macro_language_variants(pool, {"arb", "aeb"}) == {
            "arb": "ara",
            "aeb": "ara",
        }

    def test_two_requested_codes_sharing_a_macro(self):
        import pandas as pd

        from allophant_tpu.phonetics.features import _resolve_macro_language_variants

        # Without the macro inventory, both variants get the available sibling —
        # neither silently vanishes (regression: a dict comprehension keyed by
        # macro kept only the last requested code per macro).
        pool = pd.DataFrame({"ISO6393": ["arz", "spa"]})
        assert _resolve_macro_language_variants(pool, {"arb", "aeb"}) == {
            "arb": "arz",
            "aeb": "arz",
        }

    def test_unresolvable_code_is_reported(self):
        import pandas as pd

        from allophant_tpu.phonetics.features import _resolve_macro_language_variants

        pool = pd.DataFrame({"ISO6393": ["arz", "spa"]})
        with pytest.raises(ValueError, match="quc"):
            _resolve_macro_language_variants(pool, {"quc"})


class TestOptimizerParity:
    def test_adam_coupled_l2_matches_torch(self):
        """torch ``optim.Adam(weight_decay=...)`` applies *coupled* L2 (the decay
        term joins the gradient before the moment updates, reference
        config.py:328-329) — not adamw's decoupled form."""
        import jax.numpy as jnp
        import optax
        import torch

        from allophant_tpu.config import Adam

        weight_decay = 0.05
        lr = 0.01
        start = np.array([0.7, -1.3, 2.1], dtype=np.float32)
        grads = [np.array(g, dtype=np.float32) for g in ([0.3, -0.2, 0.05], [0.1, 0.4, -0.6], [-0.25, 0.0, 0.15])]

        torch_param = torch.nn.Parameter(torch.tensor(start))
        torch_optimizer = torch.optim.Adam(
            [torch_param], lr=lr, betas=(0.9, 0.98), weight_decay=weight_decay
        )
        for gradient in grads:
            torch_optimizer.zero_grad()
            torch_param.grad = torch.tensor(gradient)
            torch_optimizer.step()

        optimizer = Adam(lr, l2_regularization=weight_decay, beta_2=0.98).make(lr)
        params = jnp.asarray(start)
        state = optimizer.init(params)
        for gradient in grads:
            updates, state = optimizer.update(jnp.asarray(gradient), state, params)
            params = optax.apply_updates(params, updates)

        np.testing.assert_allclose(
            np.asarray(params), torch_param.detach().numpy(), rtol=1e-5, atol=1e-6
        )
