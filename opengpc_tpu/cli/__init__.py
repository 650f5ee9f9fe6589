"""Command-line entry points (analog of /root/reference/samples/)."""
