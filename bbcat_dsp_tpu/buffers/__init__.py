"""(populated incrementally)"""
