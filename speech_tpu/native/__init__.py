"""Native (C) host-side components; built via `make native` at the repo root."""
