"""Command-line entry points (train / inference / run_experiments /
test_experiments / label_selection)."""
