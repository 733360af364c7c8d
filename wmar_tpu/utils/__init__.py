"""Shared utilities: metrics, checkpoint IO, weight deltas, conversion."""
