"""End-to-end jobs: extract → fold → persist, with lineage + resume."""
