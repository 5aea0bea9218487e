"""`python -m allophant_tpu` runs the main `allophant` CLI."""

from allophant_tpu.cli.run import main

if __name__ == "__main__":
    main()
