"""Stateful crawl state: sharded URL-seen set, robots/politeness host state."""
