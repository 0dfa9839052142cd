"""Mutable keyed state that the Dataset API can't express (Ray actors)."""
