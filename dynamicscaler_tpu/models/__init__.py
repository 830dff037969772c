# Re-exports are added as model families land; import submodules directly.
