"""afs subpackage."""
