"""``map_batches`` stage bodies (stateless functions and actor-pool
callable classes). Everything here consumes/produces Arrow or pandas
batches and never touches ``ray.init``."""
