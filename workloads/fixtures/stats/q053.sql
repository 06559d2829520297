SELECT COUNT(*) FROM posts as p, postLinks as pl WHERE pl.PostId = p.Id AND p.PostTypeId=6 AND p.Score<=48 AND p.ViewCount>=2472 AND p.CommentCount>=3;
