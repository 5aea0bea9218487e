"""``allophant-error-rates`` CLI: macro-average PER/AER report over an evaluation
results file.

Counterpart of /root/reference/allophant/get_attribute_error_rates.py:23-90: prints
per-language phone(me) error rates with their mean, per-language and per-attribute
macro AERs, and the overall macro average."""

from __future__ import annotations

import sys
from argparse import ArgumentParser, FileType
from typing import List, Sequence, Tuple

import numpy as np


def _print_single_category_error_rates(name: str, results, error_rates: List[float]) -> None:
    for (language, _), error_rate in zip(results, error_rates):
        print(language, error_rate, sep=",")
    print(f"Average {name} error rate", np.mean(error_rates), sep=",")


def main(args: Sequence[str] | None = None) -> None:
    if args is None:
        args = sys.argv[1:]

    parser = ArgumentParser()
    parser.add_argument(
        "results_file", type=FileType("r", encoding="utf-8"),
        help="Path to a results file from the evaluation command",
    )
    parser.add_argument(
        "-l", "--languages", type=lambda codes: set(codes.split(",")),
        help="Comma separated list of language codes to display the results and averages for",
    )
    arguments = parser.parse_args(args)

    from allophant_tpu.evaluation import MultilingualEvaluationResults

    language_subset = arguments.languages
    results_data = MultilingualEvaluationResults.load(arguments.results_file)
    # The pooled "total" entry is not a language (reference
    # get_attribute_error_rates.py:43-44).
    results_data.results.pop("total", None)
    results: List[Tuple[str, dict]] = [
        (language, dict(language_results.error_rates))
        for language, language_results in results_data.results.items()
        if language_subset is None or language in language_subset
    ]

    if language_subset is not None and len(language_subset) > len(results):
        missing = language_subset - {language for language, _ in results}
        raise ValueError(
            f"Languages from -l/--languages are missing from the results file: [{', '.join(missing)}]"
        )

    print("Evaluation Arguments", results_data.evaluation_arguments)
    print("Package Version", results_data.package_version)

    first_result = results[0][1]
    phone = [] if "phone" in first_result else None
    phoneme = [] if "phoneme" in first_result else None
    attribute = []

    for _, error_rates in results:
        if phone is not None:
            phone.append(error_rates.pop("phone") * 100)
        if phoneme is not None:
            phoneme.append(error_rates.pop("phoneme") * 100)
        attribute.append(list(error_rates.values()))

    if phone is not None:
        _print_single_category_error_rates("phone", results, phone)
    if phoneme is not None:
        _print_single_category_error_rates("phoneme", results, phoneme)

    attribute_error_rates = np.array(attribute) * 100
    if not attribute_error_rates.size:
        print("No Attribute Error Rates")
        return

    for (language, _), error_rates in zip(results, attribute_error_rates.mean(1)):
        print(language, error_rates, sep=",")
    for attribute_name, error_rates in zip(results[0][1], attribute_error_rates.mean(0)):
        print(attribute_name, error_rates, sep=",")
    print("Average", attribute_error_rates.mean(), sep=",")


if __name__ == "__main__":
    main()
