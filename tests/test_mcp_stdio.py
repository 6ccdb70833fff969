"""Real-transport MCP test: spawn the server as a subprocess and speak
JSON-RPC over its stdio — the driving-adapter integration the reference
exercises through rmcp (src/mcp/server.rs:171-192)."""

import json
import subprocess
import sys

def test_mcp_stdio_roundtrip():
    lines = "\n".join(
        [
            json.dumps(
                {"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}}
            ),
            json.dumps({"jsonrpc": "2.0", "id": 2, "method": "tools/list"}),
            json.dumps(
                {
                    "jsonrpc": "2.0",
                    "id": 3,
                    "method": "tools/call",
                    "params": {
                        "name": "analyze_ticker",
                        "arguments": {"ticker": "AAPL"},
                    },
                }
            ),
            json.dumps({"jsonrpc": "2.0", "id": 4}),  # invalid: no method
        ]
    )
    proc = subprocess.run(
        [sys.executable, "-m", "openintel_tpu.cli.main", "mcp", "--offline"],
        input=lines + "\n",
        capture_output=True,
        text=True,
        timeout=110,
    )
    responses = {
        d["id"]: d for d in map(json.loads, proc.stdout.strip().splitlines())
    }
    assert responses[1]["result"]["serverInfo"]["name"] == "openintel-tpu"
    names = [t["name"] for t in responses[2]["result"]["tools"]]
    assert names[:2] == ["list_sources", "analyze_ticker"] and len(names) == 6
    body = json.loads(responses[3]["result"]["content"][0]["text"])
    assert body["report"]["fusion"]["alignment"] == "confirming_bullish"
    assert responses[4]["error"]["code"] == -32600
