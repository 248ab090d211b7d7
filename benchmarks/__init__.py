# benchmark harnesses
