SELECT COUNT(*) FROM posts as p, postLinks as pl, comments as c WHERE pl.PostId = p.Id AND c.PostId = p.Id AND p.PostTypeId<=5 AND p.ViewCount=6419 AND p.CommentCount<=16;
