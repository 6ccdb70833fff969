"""CLI driving adapter: analyze / scan / compare / pulse / risk / search /
index / setup / mcp, with table or JSON rendering."""
