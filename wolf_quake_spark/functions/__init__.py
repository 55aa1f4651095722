"""Reusable column expressions shared by the SQL-variant extract stage.

(The grok regexes live next to their consumers in operators/extract.py; this
package is the home for future shared scalar helpers.)
"""
