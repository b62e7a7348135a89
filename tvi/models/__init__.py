# Model exports are populated lazily as modules land; import submodules directly.
