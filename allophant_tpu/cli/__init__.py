"""Command-line interfaces.

Counterpart of the reference's four console scripts (reference pyproject.toml:57-61):
``allophant`` (:mod:`allophant_tpu.cli.run`), ``allophant-data``
(:mod:`allophant_tpu.cli.data`), ``allophant-features``
(:mod:`allophant_tpu.cli.features`) and ``allophant-error-rates``
(:mod:`allophant_tpu.cli.error_rates`)."""
