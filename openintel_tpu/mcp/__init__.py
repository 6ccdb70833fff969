"""MCP server (stdio JSON-RPC) exposing the six analysis tools."""
