"""Registered in later milestone."""
