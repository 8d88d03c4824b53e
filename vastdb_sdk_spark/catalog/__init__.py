from .manifest import Manifest, ManifestStore, TableEntry, FileEntry

__all__ = ["Manifest", "ManifestStore", "TableEntry", "FileEntry"]
